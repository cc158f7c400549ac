#!/usr/bin/env python3
"""Analytic per-slice roofline for the tracked train steps.

    python tools/slice_roofline.py [--model zeng|nguyen|nguyen-photo|zhang] \
        [attribute_trace_output.txt]

For every conv/deconv/BN/warp slice of the flagship architecture
(Rethinking ResNet34 DoubleLine + PF head + frozen aux extractor + biHomE
loss warps, batch 64 -> stacked 2B=128; ref: src/backbones/Rethinking.py:27-149)
this derives, from first principles (no JAX, pure arithmetic):

  flops       fwd/bwd MAC-work, 2*N*Ho*Wo*Cout*K^2*Cin per conv pass
  bytes       minimum HBM traffic (read inputs + write outputs, bf16;
              params negligible) assuming perfect fusion
  naive ms    flops / v5e bf16 peak (197 TF/s)
  lane ms     lane-aware MXU ceiling: the 128x128 systolic array runs a
              [M,Kc]x[Kc,N] matmul at eff ~= min(Kc,128)/128 * min(N,128)/128
              -- low-channel convs cannot use idle lanes, so their real
              ceiling is flops / (peak * eff)
  bw ms       bytes / 819 GB/s HBM
  ceiling     max(lane ms, bw ms) -- the structural floor for the slice

Joined (optionally) against a saved `tools/attribute_trace.py` stdout so
measured ms sits next to its ceiling: a slice within ~1.5x of ceiling is
architecture-bound; a bigger ratio is headroom. This is the evidence table
behind BENCH_NOTES "irreducibility" claims.
"""

import re
import sys

PEAK = 197e12     # v5e bf16 MXU peak, FLOP/s
BW = 819e9        # v5e HBM, B/s
B = 128           # stacked doubleline batch (2 x 64)


def conv(name, n, h, w, cin, cout, k, stride=1, bwd='full'):
    """-> list of (slice, phase, flops, bytes) for one conv layer.

    bwd: 'full' = dgrad+wgrad, 'dgrad' = input grads only (frozen params),
    'none' = under stop_gradient.
    """
    ho, wo = h // stride, w // stride
    f = 2.0 * n * ho * wo * cout * k * k * cin
    # fwd matmul geometry: [N*Ho*Wo, K^2*Cin] x [K^2*Cin, Cout]
    eff_f = min(1.0, k * k * cin / 128.0) * min(1.0, cout / 128.0)
    # dgrad: [N*H*W, K^2*Cout] x [K^2*Cout, Cin]
    eff_d = min(1.0, k * k * cout / 128.0) * min(1.0, cin / 128.0)
    # wgrad: [K^2*Cin, N*Ho*Wo] x [N*Ho*Wo, Cout] (contraction huge)
    eff_w = min(1.0, cout / 128.0)
    by_in = 2.0 * n * h * w * cin          # bf16 read
    by_out = 2.0 * n * ho * wo * cout      # bf16 write
    rows = [(name, 'fwd', f, eff_f, by_in + by_out)]
    if bwd == 'full':
        rows.append((name, 'bwd', 2 * f, (eff_d + eff_w) / 2,
                     2 * (by_in + by_out) + by_in))
    elif bwd == 'dgrad':
        rows.append((name, 'bwd', f, eff_d, by_in + by_out))
    return rows


def bn(name, n, h, w, c, bwd=True):
    """BN train-mode: fwd reads x + writes y (stats fuse); bwd reads g,x_hat
    and writes dx plus two [C] reduces -> ~3 full-res passes."""
    by = 2.0 * n * h * w * c
    rows = [(name, 'fwd', 0.0, 1.0, 2 * by)]
    if bwd:
        rows.append((name, 'bwd', 0.0, 1.0, 3 * by))
    return rows


def resnet34_block(prefix, n, h, w, cin, cout, stride, identity, bwd='full'):
    rows = []
    rows += conv(prefix, n, h, w, cin, cout, 3, stride, bwd)
    rows += conv(prefix, n, h // stride, w // stride, cout, cout, 3, 1, bwd)
    rows += bn(prefix, n, h // stride, w // stride, cout, bwd != 'none')
    rows += bn(prefix, n, h // stride, w // stride, cout, bwd != 'none')
    if not identity:
        rows += conv(prefix, n, h, w, cin, cout, 1, stride, bwd)
        rows += bn(prefix, n, h // stride, w // stride, cout, bwd != 'none')
    return rows


def deconv_block(prefix, n, h, w, c, bwd='full'):
    """ResNet50DeconvBlock with the FUSED upper path (r4,
    ops/deconv.fused_deconv_conv3x3): deconv2x2+conv3x3 compose into one
    k4/s2 dilated conv — 2.5x fewer FLOPs than the two-op literal, no
    [n,2h,2w,C] intermediate. bwd = one k4 stride-2 dgrad conv of dy +
    one batch-contracting wgrad conv over pad(dy). Then BN + conv1x1(C/2)
    + BN, lower deconv2x2(C/2) (phase-matmul) + BN."""
    rows = []
    m = float(n * h * w)
    f = 2.0 * 4 * m * 4 * c * c          # 4m outputs x 4C-tap x C MACs
    eff_f = min(1.0, 4 * c / 128.0) * min(1.0, c / 128.0)
    eff_d = min(1.0, 16 * c / 128.0) * min(1.0, c / 128.0)
    by_x = 2.0 * m * c                   # x read (bf16)
    by_y = 8.0 * m * c                   # y write at 2Hx2W
    rows += [(prefix, 'fwd', f, eff_f, by_x + by_y)]
    if bwd == 'full':
        # dgrad (read g, write dx) + wgrad (pad g: write+read, read x)
        rows += [(prefix, 'bwd', 2 * f,
                  (eff_d + min(1.0, c / 128.0)) / 2,
                  3 * by_y + 2 * by_x)]
    rows += bn(prefix, n, 2 * h, 2 * w, c, bwd != 'none')
    rows += conv(prefix, n, 2 * h, 2 * w, c, c // 2, 1, 1, bwd)
    rows += bn(prefix, n, 2 * h, 2 * w, c // 2, bwd != 'none')
    rows += conv(prefix, n, h, w, c, 4 * (c // 2), 1, 1, bwd)  # lower deconv
    rows += bn(prefix, n, 2 * h, 2 * w, c // 2, bwd != 'none')
    return rows


def tent_warp(name, b, p, w, c, bwd):
    """MXU tent contraction (geometry.batched_sample): two matmul passes
    [P,W]x[W,C]-class per axis; W = window width (128). The dominant cost
    is NOT the dots but tent-WEIGHT construction: ~1K VPU ops per sampled
    point (measured, BENCH_NOTES 'Pallas fused warp' retirement note).
    v5e VPU ~= 4 TOP/s f32 -> modeled as a vpu floor alongside the MXU
    term; bwd doubles the weight work (d/du, d/dv tents)."""
    f = 2.0 * b * p * w * c * 2
    eff = min(1.0, w / 128.0) * min(1.0, max(c, 8) / 128.0)
    by = 2.0 * b * (p * c + w * w * c + p * c)
    vpu = b * p * 1000.0 / 4e12 * 1e3            # ms, fwd weight build
    rows = [(name, 'fwd', f, eff, by, vpu)]
    if bwd:
        rows.append((name, 'bwd', 3 * f, eff, 3 * by, 1.5 * vpu))
    return rows


def flagship():
    rows = []
    n = B
    # layer1: stem 7x7/2 on 6-ch stacked input, 128x128
    rows += conv('layer1', n, 128, 128, 6, 64, 7, 2)
    rows += bn('layer1', n, 64, 64, 64)
    # layer2: 3 blocks @ 32x32, 64ch (first is conv block 64->64 stride 1)
    rows += resnet34_block('layer2_0', n, 32, 32, 64, 64, 1, identity=False)
    for i in (1, 2):
        rows += resnet34_block(f'layer2_{i}', n, 32, 32, 64, 64, 1, True)
    # layer3: 4 blocks @ 16x16, 128ch
    rows += resnet34_block('layer3_0', n, 32, 32, 64, 128, 2, False)
    for i in range(1, 4):
        rows += resnet34_block(f'layer3_{i}', n, 16, 16, 128, 128, 1, True)
    # layer4: 6 blocks @ 8x8, 256ch
    rows += resnet34_block('layer4_0', n, 16, 16, 128, 256, 2, False)
    for i in range(1, 6):
        rows += resnet34_block(f'layer4_{i}', n, 8, 8, 256, 256, 1, True)
    rows += deconv_block('layer4_deconv', n, 8, 8, 256)
    for i in range(3):
        rows += resnet34_block(f'layer5_{i}', n, 16, 16, 128, 128, 1, True)
    rows += deconv_block('layer5_deconv', n, 16, 16, 128)
    for i in range(2):
        rows += resnet34_block(f'layer6_{i}', n, 32, 32, 64, 64, 1, True)
    rows += deconv_block('layer6_deconv', n, 32, 32, 64)
    rows += resnet34_block('layer7_0', n, 64, 64, 32, 32, 1, True)
    rows += deconv_block('layer7_deconv', n, 64, 64, 32)
    # layer8: PF head 16 -> 128 -> 2 @ 128x128, FUSED Pallas kernel
    # (ops/fused_head.py): the [2B,128,128,128] mid never leaves VMEM, so
    # HBM traffic is only x(16ch) in / y(2ch) out (+ bwd: g in, dx out).
    # Lane eff is intrinsic to the shape: K=Cin=16 and M=Cout=2 leave the
    # MXU ~90% idle (measured 3.6 ms fwd+bwd microbench, BENCH_NOTES r3).
    # The backward is modeled per matmul term because keeping mid in VMEM
    # FORCES the kernel to recompute it (storing mid would round-trip
    # 2B*128*128*128 bf16 = 537 MB through HBM = 1.3 ms of bw alone, worse),
    # and the BN-stat/ReLU corrections are f32 VPU passes over that same
    # 268M-element mid space — neither appears in a pure lane model.
    msp = float(n * 128 * 128)            # spatial rows
    f1 = 2.0 * msp * 16 * 128             # x->mid matmul FLOPs
    f2 = 2.0 * msp * 128 * 2              # mid->y matmul FLOPs
    e_c1 = (16 / 128.0)                   # K=16 contraction, N=128 full
    e_c2 = (2 / 128.0)                    # N=2 output lanes
    by8 = 2.0 * msp * (16 + 2)
    # f32 VPU ops per mid element, counted from the kernel's arithmetic:
    # fwd ~6 (normalize 2, scale-shift 2, ReLU+stat-reduce 2); bwd ~14
    # (those again on the remat + mask apply, gamma-scale, dmid_hat*x_hat
    # product, two stat-reduce passes, 3-term BN-backward combine).
    vpu8 = msp * 128 * 14 / 4e12 * 1e3
    rows += [('layer8', 'fwd', f1, e_c1, by8, vpu8 * 6 / 14),
             ('layer8', 'fwd', f2, e_c2, 0.0),
             # bwd terms: remat mid (e_c1), dmid=g W2^T (K=2), dx (N=16),
             # dW2 (N=2), dW1 (N=128, huge contraction) + VPU passes.
             ('layer8', 'bwd', f1, e_c1, 2 * by8, vpu8),
             ('layer8', 'bwd', f2, e_c2, 0.0),
             # dx: N=16 output lanes -> same 16/128 lane efficiency as the
             # K=16 forward contraction (e_c1); reuse it to keep the
             # per-term efficiencies unambiguous.
             ('layer8', 'bwd', f1, e_c1, 0.0),
             ('layer8', 'bwd', f2, e_c2, 0.0),
             ('layer8', 'bwd', f1, 1.0, 0.0)]
    # aux extractor: resnet34 stem+layer1 on 128x128x3, two stacked passes
    # of [2B]: one stop-gradient (fwd only), one dgrad-only (frozen params).
    for tag, bwd in (('auxiliary_resnet', 'dgrad'),
                     ('auxiliary_resnet', 'none')):
        rows += conv(tag, n, 128, 128, 3, 64, 7, 2, bwd)
        rows += bn(tag, n, 64, 64, 64, bwd != 'none')
        for i in range(3):
            rows += resnet34_block(f'{tag}', n, 32, 32, 64, 64, 1, True, bwd)
    # biHomE loss warps: warped patches at 128x128 C=1 grayscale-projected
    # features? No -- warps run on 64-ch aux features at 32x32 + the C==1
    # patch/mask warps at 128x128 (geometry.ones_warp_mask dropped the mask
    # channel). Dominant: 2 image warps [B=64 doubled], P=128*128, W=128, C=1.
    # NB bucket name: with the C==1 custom warp VJP the flagship's loss
    # warps attribute under fwd:loss/bwd:loss (not loss-warp) — model
    # them under 'loss' so the join lines up. Measured r5: the loss
    # bucket is 3 ops of tent contraction (fwd 0.80, bwd 0.88+0.86 ms)
    # + ~0.3 ms misc; the bwd sits ~1.6x over this ceiling because XLA
    # materializes the [B,P,W] tent weights for the two backward
    # consumers (the fwd builds them inline). Alternatives measured
    # worse: Pallas kernel (r2, VPU tent floor), distance-chain fusion
    # (r5: zeng-neutral — the distances were already small here).
    rows += tent_warp('loss', 128, 128 * 128, 128, 1, bwd=True)
    # biHomE triplet distance/mask-norm chain (heads/assembled.py
    # _triplet_resnet_loss; fused via ops/fused_loss.py r5;
    # ref: PerceptualHead.py:540-665):
    # l1=|f1'-f2|, l2=|f2'-f1|, l3=|f1-f2| over [2B,32,32,64] bf16 feature
    # maps (16.8 MB per map-pass), channel hinge-aggregate, two
    # support-mask-weighted normalized sums; plus the closed-form support
    # masks avg-pooled 128->32 ([2B,128,128,1]). Perfect-fusion floor:
    #   fwd  read feats_plain + feats_w + wmask pool      ~46 MB
    #   bwd  write d(feats_w) + re-read both feats + masks ~63 MB
    # VPU: ~10 f32 ops/feature-elem fwd, ~14 bwd over 2B*32*32*64 elems.
    fe = 2.0 * 128 * 32 * 32 * 64                  # one bf16 feature map
    mk = 2.0 * 128 * 128 * 128                     # wmask [2B,128,128,1]
    vpu_l = 128 * 32 * 32 * 64 / 4e12 * 1e3        # ms per op-per-elem
    rows += [('loss', 'fwd', 0.0, 1.0, 2 * fe + mk + fe / 8,
              10 * vpu_l),
             ('loss', 'bwd', 0.0, 1.0, 3 * fe + mk / 2, 14 * vpu_l)]
    # datagen warp: window-first, B=64 source crops, C=1, no bwd
    rows += tent_warp('datagen', 64, 128 * 128, 128, 1, bwd=False)
    return rows


def _resnet34_trunk(rows, n, cin, prefix='', bwd='full'):
    """torchvision resnet34 trunk on [n,128,128,cin] (stem + 4 stages),
    scope names matching models/resnet.py (layer1_0..layer4_2)."""
    p = prefix
    rows += conv(f'{p}conv1', n, 128, 128, cin, 64, 7, 2, bwd)
    rows += bn(f'{p}conv1', n, 64, 64, 64, bwd != 'none')
    # maxpool: fwd reads/writes @64 -> 32; bwd select_and_scatter repasses
    by_mp = 2.0 * n * 64 * 64 * 64
    rows += [(f'{p}maxpool', 'fwd', 0.0, 1.0, by_mp + by_mp / 4)]
    if bwd != 'none':
        rows += [(f'{p}maxpool', 'bwd', 0.0, 1.0, 2 * by_mp)]
    for i in range(3):
        rows += resnet34_block(f'{p}layer1_{i}', n, 32, 32, 64, 64, 1,
                               True, bwd)
    rows += resnet34_block(f'{p}layer2_0', n, 32, 32, 64, 128, 2, False,
                           bwd)
    for i in range(1, 4):
        rows += resnet34_block(f'{p}layer2_{i}', n, 16, 16, 128, 128, 1,
                               True, bwd)
    rows += resnet34_block(f'{p}layer3_0', n, 16, 16, 128, 256, 2, False,
                           bwd)
    for i in range(1, 6):
        rows += resnet34_block(f'{p}layer3_{i}', n, 8, 8, 256, 256, 1,
                               True, bwd)
    rows += resnet34_block(f'{p}layer4_0', n, 8, 8, 256, 512, 2, False,
                           bwd)
    for i in range(1, 3):
        rows += resnet34_block(f'{p}layer4_{i}', n, 4, 4, 512, 512, 1,
                               True, bwd)
    return rows


def _datagen_rows(rows, n, pds=True, emit_images=False):
    """On-device pair synthesis (data/pipeline.py): window-first tent warp
    (window ~= patch + 2*rho = 192) + photometric/grayscale/standardize
    passes. PDS runs the SSD distortion chain (~8 elementwise passes incl.
    HSV round trip) over both [n,240,320,3] u8->f32 copies (window-first
    where possible; model full-frame as the ceiling is bw-trivial either
    way)."""
    rows += tent_warp('datagen', n, 128 * 128, 192, 1, bwd=False)
    passes = 8 if pds else 2
    rows += [('datagen', 'fwd', 0.0, 1.0,
              passes * 4.0 * n * 240 * 320 * (3 if pds else 1))]
    return rows


def nguyen():
    """nguyen-orig (PDS variant = the benched config): ResNet34 regressor
    on stacked grayscale patches [64,128,128,2] + NoOpHead L1 — no loss
    warp (the PhotometricHead variant is the s-coco config; ref:
    config/pds-coco/nguyen-orig-lr-5e-3.yaml HEAD.NAME NoOpHead vs
    config/s-coco/...: PhotometricHead). OneLine, batch 64."""
    rows = []
    _resnet34_trunk(rows, 64, 2)
    _datagen_rows(rows, 64, pds=True)
    return rows


def nguyen_photo():
    """nguyen-orig s-coco: same backbone + PhotometricHead — fused
    warp-then-crop samples the 128x128 patch grid from the full
    [64,240,320,1] image_1 (tent W=320) fwd+bwd
    (ref: src/heads/PhotometricHead.py:27-41)."""
    rows = []
    _resnet34_trunk(rows, 64, 2)
    rows += tent_warp('loss-warp', 64, 128 * 128, 320, 1, bwd=True)
    _datagen_rows(rows, 64, pds=False, emit_images=True)
    return rows


def zhang():
    """zhang-orig (ContentAware + TripletHead DoubleLine, FIX_MASK, batch
    64): resnet34 regressor on [2B=128,128,128,2] masked-feature stacks,
    FeatureExtractor (1->4->8->1 convs @ full 128x128 res) on the [2B]
    patch stack + two [B] warped-patch passes, 2 patch tent warps
    (closed-form support masks, geometry.ones_warp_mask), triplet
    distance maps (ref: src/backbones/ContentAware.py:55-146,
    src/heads/TripletHead.py:29-153)."""
    rows = []
    _resnet34_trunk(rows, 128, 2)

    def feat_extractor(tag, n, bwd='full'):
        rows_ = []
        rows_ += conv(tag, n, 128, 128, 1, 4, 3, 1, bwd)
        rows_ += bn(tag, n, 128, 128, 4, bwd != 'none')
        rows_ += conv(tag, n, 128, 128, 4, 8, 3, 1, bwd)
        rows_ += bn(tag, n, 128, 128, 8, bwd != 'none')
        rows_ += conv(tag, n, 128, 128, 8, 1, 3, 1, bwd)
        rows_ += bn(tag, n, 128, 128, 1, bwd != 'none')
        return rows_

    rows += feat_extractor('feature_extractor', 128)       # main [2B] pass
    rows += feat_extractor('feature_extractor', 64)        # warp(p1) pass
    rows += feat_extractor('feature_extractor', 64)        # warp(p2) pass
    # 2 patch warps [B,P=16k,W=128,C=1] fwd+bwd (masks are closed-form);
    # bucketed under 'loss' — the r5 traces attribute the tent ops there
    rows += tent_warp('loss', 64, 128 * 128, 128, 1, bwd=True)
    rows += tent_warp('loss', 64, 128 * 128, 128, 1, bwd=True)
    # triplet distance maps: ONE fused custom-vjp op since r5
    # (ops/fused_loss.py; the open-coded chain burned ~0.8 ms here)
    rows += [('loss', 'fwd', 0.0, 1.0, 6 * 4.0 * 64 * 128 * 128),
             ('loss', 'bwd', 0.0, 1.0, 9 * 4.0 * 64 * 128 * 128)]
    _datagen_rows(rows, 64, pds=True)
    return rows


MODELS = {'zeng': flagship, 'nguyen': nguyen,
          'nguyen-photo': nguyen_photo, 'zhang': zhang}


def parse_measured(path):
    """Parse attribute_trace.py stdout -> {bucket: ms}, aggregating its
    per-block buckets (fwd:layer2_0, fwd:layer2_1, ...) to this tool's
    per-stage keys (fwd:layer2); *_deconv stays distinct."""
    meas = {}
    for line in open(path):
        m = re.match(r'\s*([\d.]+) ms\s+[\d.]+\s+(\S+)', line)
        if m:
            key = re.sub(r'_\d+$', '', m.group(2))
            meas[key] = meas.get(key, 0.0) + float(m.group(1))
    return meas


def main():
    argv = sys.argv[1:]
    model = 'zeng'
    if '--model' in argv:
        i = argv.index('--model')
        model = argv[i + 1]
        del argv[i:i + 2]
    meas = parse_measured(argv[0]) if argv else {}
    agg = {}
    for row in MODELS[model]():
        name, phase, f, eff, by = row[:5]
        vpu = row[5] if len(row) > 5 else 0.0
        # bucket like attribute_trace: fwd:layerN / bwd:layerN
        base = re.sub(r'_\d+$', '', name)
        key = f'{phase}:{base}'
        a = agg.setdefault(key, [0.0, 0.0, 0.0, 0.0])
        a[0] += f
        a[1] += (f / (PEAK * eff)) if f else 0.0
        a[2] += by
        a[3] += vpu
    print(f'{"slice":22s} {"GFLOP":>7s} {"naive":>6s} {"lane":>6s} '
          f'{"bw":>6s} {"ceil":>6s} {"meas":>6s} {"x":>5s}')
    tot = [0.0] * 4
    rows = sorted(agg.items(),
                  key=lambda kv: -(max(kv[1][1], kv[1][2] / BW) + kv[1][3]))
    for key, (f, lane_s, by, vpu) in rows:
        naive = f / PEAK * 1e3
        lane = lane_s * 1e3
        bw = by / BW * 1e3
        ceil = max(lane, bw) + vpu
        m = meas.get(key)
        ratio = f'{m / ceil:5.1f}' if m and ceil else '     '
        print(f'{key:22s} {f / 1e9:7.1f} {naive:6.2f} {lane:6.2f} '
              f'{bw:6.2f} {ceil:6.2f} '
              f'{m if m is not None else float("nan"):6.2f} {ratio}')
        tot[0] += f
        tot[1] += naive
        tot[2] += ceil
        tot[3] += m or 0.0
    print(f'{"TOTAL":22s} {tot[0] / 1e9:7.1f} {tot[1]:6.2f} '
          f'{"":6s} {"":6s} {tot[2]:6.2f} {tot[3]:6.2f}')
    unmodeled = 0.0
    for key, ms in sorted(meas.items(), key=lambda kv: -kv[1]):
        if key not in agg:
            print(f'{key:22s} {"":7s} {"":6s} {"":6s} {"":6s} {"":6s} '
                  f'{ms:6.2f}  (unmodeled)')
            unmodeled += ms
    if meas:
        print(f'measured total {tot[3] + unmodeled:.2f} ms '
              f'({unmodeled:.2f} unmodeled: dsac/opt/copies/misc)')
    print(f'\nceiling pairs/s/chip (batch 64): {64e3 / tot[2]:.0f} '
          f'(naive-peak: {64e3 / tot[1]:.0f})')


if __name__ == '__main__':
    main()
