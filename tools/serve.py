"""Serve a model over HTTP with dynamic batching.

Bundle mode (one chip per process, AOT graphs, no model code needed):

    python tools/serve.py --bundle <dir> [--host 0.0.0.0] [--port 8000] \
        [--max-wait-ms 5]

Live mode (all local chips of this host, data-parallel batch sharding):

    python tools/serve.py --model <model.yaml> [--classify-prompts imagenet] \
        [--buckets 8,32,128] [opts]

Endpoints: POST /v1/embed/image (JPEG/PNG/npy body), POST /v1/embed/text
({"texts": [...]}), POST /v1/classify?topk=5, GET /healthz, GET /stats.
Scale out by running one process per chip (bundle mode) or one process
per host (live mode) behind any HTTP load balancer — embeddings are
stateless. See docs/SERVING.md.
"""

import argparse
import logging
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_args():
    p = argparse.ArgumentParser(description="HTTP inference server.")
    p.add_argument("--bundle", help="serving bundle dir (bundle mode)")
    p.add_argument("--model", help="model config yaml (live mode: serves "
                                   "over every local chip)")
    p.add_argument("--buckets", default="",
                   help="live mode: comma-separated batch buckets "
                        "(rounded up to device-count multiples)")
    p.add_argument("--classify-prompts", default="",
                   help="live mode: prompt-set name (e.g. imagenet) to "
                        "build a zero-shot classifier for /v1/classify")
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8000)
    p.add_argument("--max-wait-ms", type=float, default=5.0,
                   help="dynamic-batching window")
    p.add_argument("opts", default=None, nargs=argparse.REMAINDER)
    return p.parse_args()


def _load_live(args):
    """Build a live ServingModel from a model config (all local chips)."""
    from msclip_tpu.config import get_default_config, update_config
    from msclip_tpu.eval.checkpoint_load import load_model_params
    from msclip_tpu.models import build_model
    from msclip_tpu.serve import live_serving_model

    config = get_default_config()
    update_config(config, args.model, opts=args.opts)
    model = build_model(config)
    params = load_model_params(config, model)
    if config.TPU.get("FOLD_BN", True):
        from msclip_tpu.models.folding import fold_params_for_eval

        params = fold_params_for_eval(params, model.spec)

    classifier = classnames = None
    if args.classify_prompts:
        from msclip_tpu.data.prompts import get_classnames, get_templates
        from msclip_tpu.data.tokenizer import ClipTokenizer
        from msclip_tpu.eval.zero_shot import build_zeroshot_classifier

        classnames = get_classnames(args.classify_prompts)
        templates = get_templates(args.classify_prompts)
        logging.info(f"=> building classifier: {len(classnames)} classes "
                     f"x {len(templates)} templates")
        classifier = build_zeroshot_classifier(
            model, params, ClipTokenizer(), classnames, templates
        )
    buckets = [int(b) for b in args.buckets.split(",") if b] or None
    return live_serving_model(
        model, params, buckets=buckets,
        image_size=config.TEST.IMAGE_SIZE[0],
        classifier=classifier, classnames=classnames,
        mean=tuple(config.INPUT.MEAN), std=tuple(config.INPUT.STD),
    )


def main():
    from msclip_tpu.utils.platform import apply_platform_override

    apply_platform_override()
    args = parse_args()
    logging.basicConfig(level=logging.INFO)

    if bool(args.bundle) == bool(args.model):
        raise SystemExit("pass exactly one of --bundle or --model")

    from msclip_tpu.serve.server import InferenceServer

    if args.bundle:
        from msclip_tpu.serve import load_bundle

        logging.info(f"=> loading bundle {args.bundle}")
        model = load_bundle(args.bundle)
    else:
        logging.info(f"=> building live model from {args.model}")
        model = _load_live(args)
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
