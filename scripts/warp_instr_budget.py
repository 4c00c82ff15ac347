"""Instruction-class budget of the fused band-warp kernel (round-4 VERDICT
item 4): replace the single "170-190 VPU instr per output tile" number in
``roofline_verdict.py`` with a per-class breakdown.

Method: lower the SHIPPED kernel (``warp_rows_pallas_dma_fused``, packed
bf16 row-pair + PACK_IDX + border fast path) for the TPU target on the CPU
host — ``pl.pallas_call(debug=True)`` prints the Mosaic (tpu-dialect) MLIR
module before Mosaic compiles it — then count vector ops by class, weighted
by vreg-equivalents (product of the vector shape / (8 x 128) lanes, min 1).
The per-tile Python loops unroll at trace time, so dividing the module
totals by G*T output tiles gives the per-tile budget directly.

Caveats (stated in the output): this is the PRE-SCHEDULING op count —
Mosaic folds constants, CSEs and may combine ops, so it upper-bounds the
instruction stream; conversely multi-vreg ops that Mosaic splits are
already counted per-vreg here. The round-4 roofline calibrated 170-190
instrs/tile from MEASURED pass time at the VPU fma rate; this static count
cross-checks that number and shows where the budget sits.

CPU-side tool: run with
  env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu python scripts/warp_instr_budget.py
"""
from __future__ import annotations

import math
import os
import re
import sys
from collections import Counter
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import io

import jax
import jax.numpy as jnp


#: op -> budget class. Everything else lands in 'other'.
CLASSES = {
    "tpu.dynamic_gather": "gather",
    "arith.shrui": "unpack(shift/and)",
    "arith.shli": "unpack(shift/and)",
    "arith.andi": "unpack(shift/and)",
    "arith.ori": "unpack(shift/and)",
    "tpu.bitcast": "unpack(shift/and)",
    "arith.cmpi": "select-mask(cmp/conv)",
    "arith.cmpf": "select-mask(cmp/conv)",
    "arith.sitofp": "select-mask(cmp/conv)",
    "arith.uitofp": "select-mask(cmp/conv)",
    "arith.select": "select-mask(cmp/conv)",
    "arith.extui": "select-mask(cmp/conv)",
    "arith.mulf": "weight(mul/add)",
    "arith.addf": "weight(mul/add)",
    "arith.subf": "weight(mul/add)",
    "arith.muli": "index-arith",
    "arith.addi": "index-arith",
    "arith.subi": "index-arith",
    "arith.maxsi": "index-arith",
    "arith.minsi": "index-arith",
    "vector.load": "vmem-load",
    "vector.store": "store",
    "tpu.strided_load": "vmem-load",
    "tpu.strided_store": "store",
    "arith.truncf": "store",        # bf16 output casts feed the stores
    "vector.broadcast": "broadcast/shape",
    "vector.shape_cast": "broadcast/shape",
    "tpu.iota": "broadcast/shape",
    "vector.extract": "broadcast/shape",
    "tpu.matmul": "matmul",
    "tpu.enqueue_dma": "dma",
    "tpu.wait_dma": "dma",
}

_OP_RE = re.compile(r"=\s+\"?([a-z_]+\.[a-z_0-9]+)\"?[\s(]")
_VEC_RE = re.compile(r"vector<([0-9x]+)x(?:f32|i32|bf16|i16|i8|i1)>")


def _vregs(line: str) -> int:
    """vreg-equivalents of the op's (first) vector type; scalar ops -> 0."""
    m = _VEC_RE.search(line)
    if not m:
        return 0
    dims = [int(d) for d in m.group(1).split("x")]
    lanes = dims[-1] if dims else 1
    subl = math.prod(dims[:-1]) if len(dims) > 1 else 1
    # a vreg is 8 sublanes x 128 lanes; i1 masks still occupy issue slots
    return max(1, math.ceil(subl / 8) * math.ceil(lanes / 128))


def mosaic_module(fn, *args) -> str:
    """Lower ``fn`` for the TPU target and return the printed Mosaic module
    text (pallas debug=True prints it at lowering time)."""
    import jax.experimental.pallas as pl

    import fsnet_tpu.ops.pallas.warp_kernel as wk

    orig = pl.pallas_call

    def patched(*a, **k):
        k["debug"] = True
        return orig(*a, **k)

    wk.pl.pallas_call = patched
    buf = io.StringIO()
    try:
        with redirect_stdout(buf):
            jax.jit(fn).trace(*args).lower(lowering_platforms=("tpu",))
    finally:
        wk.pl.pallas_call = orig
    txt = buf.getvalue()
    key = "The Mosaic module"
    assert key in txt, "no Mosaic dump captured — pallas debug API changed?"
    return txt[txt.index(key):]


def budget(module_txt: str, n_tiles: int):
    """(per-class vreg-ops per output tile, total) from the module text."""
    per_class = Counter()
    per_op = Counter()
    main = module_txt
    # stop at the first transform_ func (index maps — not kernel body)
    cut = main.find("func.func @transform_")
    if cut > 0:
        main = main[:cut]
    for line in main.splitlines():
        m = _OP_RE.search(line)
        if not m:
            continue
        op = m.group(1)
        v = _vregs(line)
        if v == 0:
            continue
        cls = CLASSES.get(op, f"other({op})")
        per_class[cls] += v
        per_op[op] += v
    total = sum(per_class.values())
    return ({k: v / n_tiles for k, v in per_class.items()},
            total / n_tiles, per_op)


def flagship_fused():
    """The shipped KITTI configuration: packed bf16 row pairs, band=4,
    PACK_IDX + BORDER_FAST + STACK_WIN defaults, G=8, W=640 (T=5)."""
    import fsnet_tpu.ops.pallas.warp_kernel as wk

    B, Ho, W, C, band = 2, 16, 640, 3, 4
    T = W // 128
    rows = band // 2
    img = jnp.zeros((B, T, (Ho // 2) * C, 128), jnp.float32)
    ymin = jnp.zeros((B, Ho), jnp.int32)
    ws = jnp.zeros((B, Ho, T), jnp.int32)
    iword = jnp.zeros((B, Ho, W), jnp.int32)
    fpack = jnp.zeros((B, 2, Ho, W), jnp.float32)

    def f(img, ymin, ws, iword, fpack):
        return wk.warp_rows_pallas_dma_fused(
            img, ymin, ws, iword, fpack, rows, C, group=8, packed=True,
            tiled_vjp=False, border=True)

    G = 8
    return f, (img, ymin, ws, iword, fpack), G * T


def main():
    fn, args, n_tiles = flagship_fused()
    txt = mosaic_module(fn, *args)
    per_class, total, per_op = budget(txt, n_tiles)
    print("# Fused band-warp kernel: static Mosaic vreg-op budget per "
          "output tile")
    print(f"# (shipped flagship config: packed bf16, band=4, border fast, "
          f"PACK_IDX; {n_tiles} tiles/grid block)")
    print(f"{'class':30s} {'vreg-ops/tile':>14s} {'share':>7s}")
    for cls, v in sorted(per_class.items(), key=lambda kv: -kv[1]):
        print(f"{cls:30s} {v:14.1f} {v / total:7.1%}")
    print(f"{'TOTAL':30s} {total:14.1f}")
    print()
    print("# top raw ops")
    for op, v in per_op.most_common(12):
        print(f"  {op:24s} {v / n_tiles:8.1f}/tile")
    print()
    print("# Cross-check: the round-4 roofline priced the warp floor at "
          "170-190 MEASURED instr/tile")
    print("# (pass time / tiles / VPU rate). The static count above is "
          "pre-Mosaic-scheduling and")
    print("# upper-bounds the stream; classes dominated by [KL=6->8,128] "
          "operands are 1 vreg each.")


if __name__ == "__main__":
    main()
