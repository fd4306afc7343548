"""Per-generation kernel tuning constants.

The Pallas tile pickers and fast-path gates in this package were measured
on TPU v5e (16 MB VMEM/core). Other generations differ in VMEM size and
in the launch-overhead/fusion trade-offs, so the constants live in one
generation-keyed table instead of being scattered as magic numbers —
on an unmeasured generation we fall back to the conservative v5e values
(they carry headroom) rather than silently mis-tiling.

Environment overrides (highest precedence, for on-device tuning sweeps):

* ``MSCLIP_ATTN_VMEM``    — attention-core VMEM budget, bytes
* ``MSCLIP_QUANT_VMEM``   — fused-quant kernel VMEM budget, bytes
* ``MSCLIP_INT8_MIN_SEQ`` — min sequence length for the fused int8
  eval block (below it the extra kernel launches lose; see
  ``models/layers.py:transformer_block``)
* ``MSCLIP_ATTN_PACK``   — batch rows packed per maskless short-seq
  attention score tile (1 = off; see ``ops/attention.py``)
"""

from __future__ import annotations

import functools
import os
from dataclasses import dataclass

_MB = 1024 * 1024


@dataclass(frozen=True)
class KernelTuning:
    # one program's double-buffered in+out blocks for the attention core
    # (of VMEM/core, leaving headroom for the scores/softmax scratch)
    attn_vmem_budget: int
    # fused ln_quant/gelu_quant blocks (body also holds fp32 LN
    # temporaries ~tb*L*E*4, hence the lower budget)
    quant_vmem_budget: int
    # int8 eval fast-path gate: fused-quant kernels only win when the
    # saved quant passes outweigh four extra launches per block
    int8_min_seq: int
    # maskless short-seq attention: pack this many batch rows into one
    # score tile (block-diagonal additive mask) so the 128-lane pad does
    # real softmax work (L=50 otherwise pads lanes 2.56x). 1 = off.
    # Sweep: experiments/attn_pack_sweep.py; verdict in docs/KERNELS.md
    # "Lane-packed short sequences".
    attn_lane_pack: int


# v5e numbers are measured (BENCH/PARITY rounds 2-3); v4/v5p share the
# 16 MB VMEM/core envelope so they inherit them; v6e (Trillium) has twice
# the VMEM — budgets scale with it, gates kept until measured.
#
# Budget 14 MB re-confirmed by the r3 L=77/50/197 tile sweeps: every
# pick it produces (fwd 16/8/4, bwd 8/8/2) is the in-context optimum.
# The one standalone anomaly — text fwd L=77 tb=16 is 18% faster than
# the picked tb=8 when the kernel runs ALONE (1.24 vs 1.50 ms/call at
# B=256) — does NOT survive in-graph: with the GEMMs and LNs scheduled
# around it, blocks time is 27.9 (tb=16) vs 27.1 ms (tb=8) and the full
# train step is neutral-to-worse, so the larger tile's VMEM pressure
# costs more than its grid amortization saves. Raising the budget to
# 15.5 MB to flip that pick was measured and rejected.
_TABLE = {
    "v4": KernelTuning(14 * _MB, 11 * _MB, 96, 1),
    "v5e": KernelTuning(14 * _MB, 11 * _MB, 96, 1),
    "v5p": KernelTuning(14 * _MB, 11 * _MB, 96, 1),
    "v6e": KernelTuning(28 * _MB, 22 * _MB, 96, 1),
}
_DEFAULT = _TABLE["v5e"]


def _generation() -> str:
    """Best-effort TPU generation from device_kind ('TPU v5 lite' etc.);
    unknown/CPU/interpret -> 'v5e' defaults."""
    try:
        import jax

        kind = jax.devices()[0].device_kind.lower()
    except Exception:
        return "v5e"
    if "v6" in kind:
        return "v6e"
    if "v5" in kind:
        return "v5p" if "p" in kind.split("v5", 1)[1][:2] else "v5e"
    if "v4" in kind:
        return "v4"
    return "v5e"


@functools.lru_cache(maxsize=None)
def get_tuning() -> KernelTuning:
    base = _TABLE.get(_generation(), _DEFAULT)
    attn = int(os.environ.get("MSCLIP_ATTN_VMEM", base.attn_vmem_budget))
    quant = int(os.environ.get("MSCLIP_QUANT_VMEM", base.quant_vmem_budget))
    minseq = int(os.environ.get("MSCLIP_INT8_MIN_SEQ", base.int8_min_seq))
    pack = int(os.environ.get("MSCLIP_ATTN_PACK", base.attn_lane_pack))
    return KernelTuning(attn, quant, minseq, pack)
