"""Serve a bundle over HTTP with dynamic batching.

    python tools/serve.py --bundle <dir> [--host 0.0.0.0] [--port 8000] \
        [--max-wait-ms 5]

Endpoints: POST /v1/embed/image (JPEG/PNG/npy body), POST /v1/embed/text
({"texts": [...]}), POST /v1/classify?topk=5, GET /healthz, GET /stats.
Scale out by running one process per chip behind any HTTP load balancer
(embeddings are stateless). See docs/SERVING.md.
"""

import argparse
import logging
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_args():
    p = argparse.ArgumentParser(description="HTTP inference server.")
    p.add_argument("--bundle", required=True, help="serving bundle dir")
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8000)
    p.add_argument("--max-wait-ms", type=float, default=5.0,
                   help="dynamic-batching window")
    return p.parse_args()


def main():
    from msclip_tpu.utils.platform import apply_platform_override

    apply_platform_override()
    args = parse_args()
    logging.basicConfig(level=logging.INFO)

    from msclip_tpu.serve import load_bundle
    from msclip_tpu.serve.server import InferenceServer

    logging.info(f"=> loading bundle {args.bundle}")
    model = load_bundle(args.bundle)
    # warm the compile cache before accepting traffic: one call per bucket
    import numpy as np

    for b in model.buckets:
        model.encode_image(
            np.zeros((b, model.image_size, model.image_size, 3), np.uint8)
        )
        model.encode_text(
            np.zeros((b, model.context_length), np.int32)
        )
    logging.info(f"=> warmed {len(model.buckets)} image+text buckets")
    server = InferenceServer(model, host=args.host, port=args.port,
                             max_wait_ms=args.max_wait_ms)
    print(f"SERVING http://{server.address[0]}:{server.address[1]}",
          flush=True)
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        server.close()


if __name__ == "__main__":
    main()
