"""Analytic speed-of-light for the flagship KITTI step (CPU-only; no TPU).

Computes per-block FLOPs / HBM bytes / VPU issue-slot counts for the
shipped default route (band4 bf16 packed decoder + prep kernel + XLA
photometric) and divides by the MEASURED chip peaks from
``scripts/tpu_roofline.py`` (BASELINE.md round-4 section) to get each
block's hardware floor. The verdict table goes to BASELINE.md by hand,
next to the profiler attribution from ``scripts/tpu_trace.py``.

Usage: env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu python scripts/roofline_verdict.py
"""
import math

# measured denominators (scripts/tpu_roofline.py, v5e single chip)
HBM = 657e9            # B/s, achieved on 1R+1W streams
MXU = 192.5e12         # bf16 FLOP/s, achieved on 4096^3
MXU_POOL = 62.4e12     # dense-equiv FLOP/s of the [192,192] SSIM pool matmul
VPU_FMA = 2.04e12      # f32 fma/s (dependent chain)
VPU_CMP = 1.40e12      # f32 compare+select/s

B, H, W, C = 12, 192, 640, 3
S, F = 4, 2
N = S * F * B          # photometric warps
bf2, f4 = 2, 4         # bytes


def ms(sec):
    return sec * 1e3


# ---------------------------------------------------------------- backbone
def resnet18_convs(h, w):
    """(FLOPs fwd, activation elems fwd) per image."""
    fl, act = 0, 0

    def conv(h, w, cin, cout, k, stride=1):
        nonlocal fl, act
        ho, wo = h // stride, w // stride
        fl += 2 * ho * wo * cin * cout * k * k
        act += ho * wo * cout
        return ho, wo

    h, w = conv(h, w, 3, 64, 7, 2)           # stem
    h, w = h // 2, w // 2                     # maxpool
    for _ in range(4):
        conv(h, w, 64, 64, 3)                 # layer1: 2 blocks x 2 convs
    specs = [(64, 128), (128, 256), (256, 512)]
    for cin, cout in specs:
        h2, w2 = conv(h, w, cin, cout, 3, 2)  # downsample conv
        conv(h2, w2, cout, cout, 3)
        conv(h, w, cin, cout, 1, 2)           # projection shortcut
        conv(h2, w2, cout, cout, 3)
        conv(h2, w2, cout, cout, 3)
        h, w = h2, w2
    return fl, act


def decoder_convs(h, w):
    """MultiChannelDepthDecoder (monodepth2 decoder, 16-bin head): upconvs
    256..16 with skips, two 3x3 convs per scale + 4 disp heads."""
    fl, act = 0, 0
    chans = [256, 128, 64, 32, 16]
    skips = [256, 128, 64, 64, 0]
    hh, ww = h // 32, w // 32
    cin = 512
    for i, co in enumerate(chans):
        # upconv0 at current res, then upsample, concat skip, upconv1
        fl += 2 * hh * ww * cin * co * 9
        act += hh * ww * co
        hh, ww = hh * 2, ww * 2
        fl += 2 * hh * ww * (co + skips[i]) * co * 9
        act += hh * ww * co
        cin = co
    for s, (sh, sw) in enumerate([(h, w), (h // 2, w // 2),
                                  (h // 4, w // 4), (h // 8, w // 8)]):
        co = chans[4 - s] if s else 16
        fl += 2 * sh * sw * co * 16 * 9       # 16-bin disp head
        act += sh * sw * 16
    return fl, act


bb_fl, bb_act = resnet18_convs(H, W)
dec_fl, dec_act = decoder_convs(H, W)
print("== per-image fwd ==")
print(f"resnet18 convs: {bb_fl/1e9:.2f} GFLOP, activations {bb_act/1e6:.2f} M elems")
print(f"decoder convs:  {dec_fl/1e9:.2f} GFLOP, activations {dec_act/1e6:.2f} M elems")

# fwd + bwd(2x fwd) over the batch
conv_fl = 3 * B * (bb_fl + dec_fl)
t_mxu = conv_fl / MXU
print(f"\nconv FLOPs/step (fwd+bwd, bs{B}): {conv_fl/1e12:.3f} TFLOP "
      f"-> MXU floor {ms(t_mxu):.2f} ms (at 4096^3 rate; small-C stages "
      f"reach far less)")

# BN/elementwise HBM floor: each ConvBnReLU reads+writes its activation
# ~4x per step (fwd: stats read + normalize read/write; bwd: the mirrors),
# bf16. Train-mode BN is parity-mandated (reference depth_encoder.py).
act_bytes = (bb_act + dec_act) * B * bf2
t_bn = 6 * act_bytes / HBM
print(f"activation volume: {act_bytes/1e6:.0f} MB bf16 "
      f"-> BN/elementwise HBM floor ~{ms(t_bn):.2f} ms (6 passes)")

# ------------------------------------------------------------- warp kernels
# fused fwd+vjp pass, band4 packed. The kernel's unit of work is one
# (output row, 128-lane W-tile). Round-5 replaced the single measured
# "170-190 instr/tile" number with a static per-class budget from the
# Mosaic module (scripts/warp_instr_budget.py): 176.4 vreg-ops/tile =
# select-mask 57 (32%) + weight mul/add 37 (21%) + broadcast/shape 29
# (16%) + unpack 17 (10%) + index-arith 11 + vmem loads 6 + GATHERS 6
# (3.4%) + stores 3 + other 10 — the static total lands inside the
# measured band, cross-validating both. Irreducibility: the kernel is NOT
# gather-bound; the dominant cmp/conv+broadcast classes are the y-select/
# weight field whose two alternative formulations (FOLD_WIN pre-folded
# rows; [1, L] lane-row compares) were both measured SLOWER on hardware
# (BASELINE.md negative results), and at KL <= 8 every [KL, L] op is one
# vreg op regardless of micro-shaping. The VPU issues ~2.0 G vector
# instr/s = measured 2.04 Tfma/s / 1024 lanes.
VPU_ISSUE = VPU_FMA / 1024                  # vector instructions / s
row_tiles = N * H * (W // 128)
for instr in (170, 190):
    t = row_tiles * instr / VPU_ISSUE
    print(f"warp issue floor at {instr} instr/row-tile: {ms(t):.2f} ms")
out_bytes = 3 * N * H * W * C * bf2         # out, va, vb
band_dma = N * H * (W // 128) * 3 * (4 // 2) * C * 128 * f4  # 3-tile window
field_bytes = N * H * W * (f4 + 2 * f4)     # iword + 2 fraction rows
warp_hbm = out_bytes + band_dma + field_bytes
t_warp_hbm = warp_hbm / HBM
t_warp_vpu = row_tiles * 170 / VPU_ISSUE
print(f"warp fused pass HBM {warp_hbm/1e6:.0f} MB -> "
      f"{ms(t_warp_hbm):.2f} ms (issue bound governs)")

# prep kernel: one pass over S*B depth maps -> N index/fraction fields
prep_hbm = (S * B * H * W * f4 + N * H * W * (f4 + 2 * f4))
print(f"prep kernel HBM {prep_hbm/1e6:.0f} MB -> {ms(prep_hbm/HBM):.2f} ms")

# ------------------------------------------------------------- photometric
# SSIM pooling as banded matmuls: per warp 3 pred-side pooled quantities
# fwd (mu_x, E[x^2], E[xy]; target-side shared across S*F), ~2x for bwd
# (pooled adjoints); each pool = H-band @ x + x @ W-band DENSE matmuls at
# the measured dense-equivalent pool rate. This is a BEST-KNOWN-ALGORITHM
# floor, not a hardware one (the band-3 stencil does 1/64th the FLOPs but
# measured 36% slower end-to-end — BASELINE.md SSIM A/B): the hardware
# floor is the HBM line below.
pool_fl = 2 * H * H * W * C + 2 * W * W * H * C  # one pooled qty, one image
photo_fl = N * (3 + 6) * pool_fl
t_photo_mxu = photo_fl / MXU_POOL
photo_hbm = (N * H * W * C * bf2) * (2 + 3 + 3)  # read pred+tgt, pools, bwd
t_photo_hbm = photo_hbm / HBM
print(f"photometric: pools {photo_fl/1e12:.2f} TFLOP dense-equiv -> "
      f"{ms(t_photo_mxu):.2f} ms at measured pool-matmul rate; HBM floor "
      f"{photo_hbm/1e6:.0f} MB -> {ms(t_photo_hbm):.2f} ms")

# min-reproj/automask: elementwise min/select over [S, F+1, B, H, W]
minr_elems = S * (F + 1) * B * H * W
t_min = minr_elems / VPU_CMP
minr_hbm = (S * F * B * H * W) * bf2 * 2
print(f"min/automask: {minr_elems/1e9:.2f} G cmp -> {ms(t_min):.2f} ms; "
      f"HBM {minr_hbm/1e6:.0f} MB -> {ms(minr_hbm/HBM):.2f} ms")

# ------------------------------------------------------------- optimizer
params = 11.7e6 + 3.3e6                      # resnet18 + decoder approx
opt_bytes = params * (f4 * 7)                # p, m, v read + write, g read
print(f"adam+clip: {opt_bytes/1e6:.0f} MB -> {ms(opt_bytes/HBM):.2f} ms")

total = (t_mxu + t_bn + max(t_warp_vpu, t_warp_hbm) + prep_hbm / HBM
         + max(t_photo_mxu, t_photo_hbm) + max(t_min, minr_hbm / HBM)
         + opt_bytes / HBM)
print(f"\nsum of block floors: {ms(total):.1f} ms "
      f"-> {B/total:.0f} imgs/s hardware ceiling (optimistic: assumes "
      f"every block at its best-case bound, zero overlap losses)")
