"""Torch-semantics neural-net primitives, NHWC, for TPU.

Every op here is a behavioral twin of the torch layer the reference uses
(reference models/model_architectures.py), verified by golden tests against
CPU torch in tests/test_ops_vs_torch.py.  Layout is NHWC (TPU-native) with
HWIO kernels; the reference's NCHW tensors map to these at the IO boundary.

Design notes (TPU):
- convs lower to XLA convolutions that tile onto the MXU; channel counts in
  this model family (64..1024) align well with 128-lane registers.
- conv_transpose is expressed as an input-dilated conv (lhs_dilation), the
  exact functional equivalent of torch's ConvTranspose2d including
  output_padding; XLA handles dilated convs natively on TPU.
- normalisations are written so XLA fuses them into neighbouring ops; a
  fused Pallas instance-norm kernel lives in ops/pallas_kernels.py.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax

DIMSPEC = ("NHWC", "HWIO", "NHWC")


def conv2d(
    x: jax.Array,
    w: jax.Array,
    b: Optional[jax.Array] = None,
    stride: int = 1,
    padding: int = 0,
) -> jax.Array:
    """torch.nn.Conv2d twin. ``w`` is HWIO; torch's OIHW maps via
    ``w_torch.permute(2, 3, 1, 0)``.  Both are cross-correlations.

    Narrow-output convs (the 27/10/3-channel decoder heads) waste MXU
    lanes: cout 27 uses 21% of a 128-lane register and XLA's emitters run
    them at ~20 TF/s at 512^2 (measured in-step, BENCH_NOTES round 2).
    For stride-1 cases the *phase-fold* path rewrites the conv in 2x2
    space-to-depth coordinates with all four output phases folded into the
    channel dim (one conv, 4*cout outputs, 4*cin inputs at H/2 x W/2) —
    same math, ~4x lane utilization, measured ~2.6x faster forward in the
    model's decoder context (tools/microbench_head.py).  Disable with
    FLOODGAN_PHASEFOLD=0."""
    kh, kw, _, cout = w.shape
    if _phasefold_eligible(x, w, stride, padding):
        out = _conv2d_phasefold(x, w, padding)
    elif _phasefold_s2_eligible(x, w, stride, padding):
        out = _conv2d_phasefold_s2(x, w, padding)
    else:
        out = lax.conv_general_dilated(
            x,
            w,
            window_strides=(stride, stride),
            padding=((padding, padding), (padding, padding)),
            dimension_numbers=DIMSPEC,
        )
    if b is not None:
        out = out + b
    return out


def _phasefold_enabled() -> bool:
    import os

    return os.environ.get("FLOODGAN_PHASEFOLD", "1") not in ("0", "false", "")


def _phasefold_eligible(x, w, stride: int, padding: int) -> bool:
    kh, kw, cin, cout = w.shape
    if stride != 1 or kh != kw:
        return False
    # narrow outputs (27/10/3-ch heads: lane waste) or narrow inputs
    # (9-ch stems: sublane waste) benefit; full-width convs don't.
    if not (cout < 32 or (cin < 16 and cout <= 128)):
        return False
    n, h, wd, c = x.shape
    out_h = h + 2 * padding - kh + 1
    out_w = wd + 2 * padding - kw + 1
    # even outputs only (2x2 phase grid), and large enough to matter
    if out_h % 2 or out_w % 2 or min(out_h, out_w) < 128:
        return False
    return _phasefold_enabled()


def _phasefold_s2_eligible(x, w, stride: int, padding: int) -> bool:
    """Strided variant: a k x k stride-2 conv over thin inputs (the 9/12-ch
    PatchGAN/pix2pix encoder stems) becomes a (k+1)//2-kernel stride-1 conv
    over the 4C space-to-depth channels — same FLOPs, 4x the input-channel
    depth (sublane utilization).

    Measured on v5e (BENCH_NOTES round 2): +0.5 samples/s for the attention
    family but -8 for pix2pix (whose step is dominated by these stem convs
    and pays the s2d reshuffle without enough conv time to win back), i.e.
    net-neutral to negative across the model zoo — so this path is opt-in
    via FLOODGAN_PHASEFOLD_S2=1 rather than automatic."""
    import os

    if os.environ.get("FLOODGAN_PHASEFOLD_S2") != "1":
        return False
    kh, kw, cin, cout = w.shape
    if stride != 2 or kh != kw or cin >= 16:
        return False
    n, h, wd, c = x.shape
    if (h + 2 * padding) % 2 or (wd + 2 * padding) % 2:
        return False
    out_h = (h + 2 * padding - kh) // 2 + 1
    out_w = (wd + 2 * padding - kw) // 2 + 1
    if min(out_h, out_w) < 128:
        return False
    return _phasefold_enabled()


def _phase_embed_kernel(w: jax.Array, shift: int = 1) -> jax.Array:
    """Embed the four 2x2 output phases of a conv into one kernel.

    Output phase of = r*2+c of a (possibly strided) conv is the same conv
    evaluated at positions offset by (r*shift, c*shift) in input space, so
    placing ``w`` at spatial offset (r*shift, c*shift) inside a
    (kh+shift, kw+shift) kernel and concatenating the four placements on
    the output-channel dim (phase-major: channel of*cout+co) yields a
    kernel K with  conv(x, K, stride=2*orig_stride)[t, u, of*cout+co]
    = conv(x, w, orig_stride)[2t+r, 2u+c, co].  shift = orig_stride.

    Unlike a space-to-depth rewrite of the *activations*, this touches only
    the (tiny) kernel — no 6-D transpose copies of multi-MB feature maps
    (profiled at 15-20 ms/step on v5e before this lowering)."""
    kh, kw, cin, cout = w.shape
    blocks = [
        jnp.pad(w, ((r, shift - r), (c, shift - c), (0, 0), (0, 0)))
        for r in (0, shift)
        for c in (0, shift)
    ]
    return jnp.concatenate(blocks, axis=3)


def _conv2d_phasefold_s2(x: jax.Array, w: jax.Array, padding: int) -> jax.Array:
    """Phase-folded stride-2 conv: one stride-4 conv with the four output
    phases embedded in a (k+2, k+2) kernel (``_phase_embed_kernel`` with
    shift 2), then a pixel interleave.  Numerically the same conv."""
    kh, kw, cin, cout = w.shape
    n, H, W, C = x.shape
    out_h = (H + 2 * padding - kh) // 2 + 1
    out_w = (W + 2 * padding - kw) // 2 + 1
    K = _phase_embed_kernel(w, shift=2)
    # odd out sizes: 2 extra rows/cols of zero-pad so the last (trimmed)
    # phase slot has a full window; depth_to_space_phases drops it.
    out = lax.conv_general_dilated(
        x,
        K,
        window_strides=(4, 4),
        padding=(
            (padding, padding + 2 * (out_h & 1)),
            (padding, padding + 2 * (out_w & 1)),
        ),
        dimension_numbers=DIMSPEC,
    )
    return depth_to_space_phases(out, out_h, out_w, cout)


def _conv2d_phasefold_phases(x: jax.Array, w: jax.Array, padding: int):
    """Phase-space core of the phase-fold lowering: returns
    (phases (n, out_h/2, out_w/2, 4*cout), out_h, out_w) with phase-major
    channel order — channel of*cout+co holds output phase of = r*2+c.

    One stride-2 conv with the phase-embedded (k+1, k+1) kernel; the
    activations are never rearranged (see ``_phase_embed_kernel``)."""
    kh, kw, cin, cout = w.shape
    n, H, W, C = x.shape
    out_h, out_w = H + 2 * padding - kh + 1, W + 2 * padding - kw + 1
    K = _phase_embed_kernel(w, shift=1)
    out = lax.conv_general_dilated(
        x,
        K,
        window_strides=(2, 2),
        padding=((padding, padding), (padding, padding)),
        dimension_numbers=DIMSPEC,
    )
    return out, out_h, out_w


def _conv2d_phasefold(x: jax.Array, w: jax.Array, padding: int) -> jax.Array:
    """Stride-1 conv2d in 2x2 space-to-depth coordinates, all four output
    phases folded into the channel dim.  out[2t+r, 2u+c] = sum_{j,k}
    w[j,k] x[2t+r+j, 2u+c+k]: grouping (r+j) and (c+k) by parity turns the
    k x k conv over C channels into one kb x kb conv over 4C channels with
    4*cout outputs, kb = k//2 + 1.  Numerically the same conv (golden
    tested vs the direct lowering); only the accumulation order differs."""
    out, out_h, out_w = _conv2d_phasefold_phases(x, w, padding)
    return depth_to_space_phases(out, out_h, out_w, w.shape[3])


def conv2d_s2_phase_input(
    xp: jax.Array,
    w: jax.Array,
    splits,
    b: Optional[jax.Array] = None,
) -> jax.Array:
    """k x k stride-2 pad-1 conv evaluated directly on a 2x2 phase
    decomposition (derived for any k; the model family uses k4 PatchGAN
    stems and the k3 encoder stem).

    ``xp`` is (n, H/2, W/2, 4*C_total): a channel-concat of phase-major
    space-to-depth groups (``space_to_depth_phases`` layout, group sizes in
    ``splits`` summing to C_total = w.shape[2]).  Output equals
    ``conv2d(x_image, w, stride=2, padding=1)`` exactly — a k4 s2 conv's
    output grid IS the phase grid, and each tap lands on one input phase:
    out[t,u] = sum_{j,k} w[j,k] x[2t+j-1, 2u+k-1] with 2t+j-1 = 2(t+d)+r,
    so phase r contributes taps j = 2d+r+1 at phase-grid offsets
    d in {0,1} (r=0) / {-1,0} (r=1).  Embedding those taps in a 3x3
    stride-1 kernel over the 4C phase channels (zeros elsewhere) gives one
    dense conv whose input never exists at full resolution — the point:
    (N,H,W,3)-like tensors pad 42.7x on TPU (3 -> 128 lanes, BENCH_NOTES
    high-resolution study); their phase form pads 128/(4C).

    The embedded kernel is assembled from ``w`` with gathers, so gradients
    flow to ``w`` unchanged."""
    kh, kw, cin, cout = w.shape
    if kh != kw:
        raise ValueError("phase-input lowering needs a square kernel")
    if sum(splits) != cin:
        raise ValueError(f"splits {splits} must sum to cin={cin}")
    # out[t] = sum_j w[j] X[2t + j - 1]; X index 2(t+d)+a gives j = 2d+a+1,
    # so input phase a contributes taps j = 2d+a+1 at phase-grid offsets d
    # with 0 <= j < k.  (k=4: a=0 -> j 1,3 at d 0,1; a=1 -> j 0,2 at
    # d -1,0.  k=3, the encoder's s2 stem: a=0 -> j1 at d0; a=1 -> j 0,2
    # at d -1,0.)
    taps = {}
    dmin, dmax = 0, 0
    for a in (0, 1):
        pairs = [((j - a - 1) // 2, j) for j in range(kh) if (j - a - 1) % 2 == 0]
        taps[a] = pairs
        dmin = min(dmin, min(d for d, _ in pairs))
        dmax = max(dmax, max(d for d, _ in pairs))
    ext = dmax - dmin + 1
    wp = jnp.zeros((ext, ext, 4 * cin, cout), w.dtype)
    for r in (0, 1):
        for c in (0, 1):
            off_g = 0
            for g, cg in enumerate(splits):
                # channel block of group g, phase (r, c) in the concat layout
                lo = 4 * off_g + (r * 2 + c) * cg
                for dh, jh in taps[r]:
                    for dw, jw in taps[c]:
                        wp = wp.at[dh - dmin, dw - dmin, lo : lo + cg, :].set(
                            w[jh, jw, off_g : off_g + cg, :]
                        )
                off_g += cg
    out = lax.conv_general_dilated(
        xp, wp, (1, 1), ((-dmin, dmax), (-dmin, dmax)), dimension_numbers=DIMSPEC
    )
    if b is not None:
        out = out + b
    return out


def _phase_p2p_kernel(w: jax.Array, p: int):
    """Embedded kernel for the stride-1 phase-to-phase conv (see
    conv2d_phase_to_phase's derivation): taps of a k x k image conv with
    padding p placed into an (ext, ext) kernel over 4*cin phase channels
    with 4*cout phase-major outputs; zeros where a (r, d, a) triple has no
    valid image tap.  Returns (kernel, dmin, dmax)."""
    kh, kw, cin, cout = w.shape
    dmin = min((r - p) // 2 for r in (0, 1))
    dmax = max((r + kh - 1 - p) // 2 for r in (0, 1))
    ext = dmax - dmin + 1
    wp = jnp.zeros((ext, ext, 4 * cin, 4 * cout), w.dtype)
    for r in (0, 1):
        for c in (0, 1):
            for d in range(dmin, dmax + 1):
                for dd in range(dmin, dmax + 1):
                    for a in (0, 1):
                        for bb in (0, 1):
                            j = 2 * d + a + p - r
                            k = 2 * dd + bb + p - c
                            if not (0 <= j < kh and 0 <= k < kw):
                                continue
                            wp = wp.at[
                                d - dmin,
                                dd - dmin,
                                (a * 2 + bb) * cin : (a * 2 + bb + 1) * cin,
                                (r * 2 + c) * cout : (r * 2 + c + 1) * cout,
                            ].set(w[j, k])
    return wp, dmin, dmax


def _phase_p2p_split_kernels(w: jax.Array, p: int):
    """Per-INPUT-phase kernels for the split phase-to-phase conv (see
    core/flags.p2p_split for the rationale).  For input row-phase a the
    valid phase-grid offsets d of output row-phase r satisfy
    j = 2d + a + p - r in [0, k) with (j + r - a - p) even — r is unique
    per (j, a) parity, so each image tap lands exactly once per input
    phase.  Returns [(K_ab, (dmin_r, dmax_r), (dmin_c, dmax_c))] in
    phase-major (a*2+b) order; K_ab is (ext_r, ext_c, cin, 4*cout) with
    output phases (r*2+c)-major on the last dim — the same output layout
    as the dense embedding, so the four group convs sum elementwise."""
    kh, kw, cin, cout = w.shape

    def taps(a, k):
        out = []
        for r in (0, 1):
            for j in range(k):
                if (j + r - a - p) % 2 == 0:
                    out.append((r, (j + r - a - p) // 2, j))
        return out

    kernels = []
    for a in (0, 1):
        ta = taps(a, kh)
        dr0, dr1 = min(d for _, d, _ in ta), max(d for _, d, _ in ta)
        for bp in (0, 1):
            tb = taps(bp, kw)
            dc0, dc1 = min(d for _, d, _ in tb), max(d for _, d, _ in tb)
            K = jnp.zeros((dr1 - dr0 + 1, dc1 - dc0 + 1, cin, 4 * cout), w.dtype)
            for r, d, j in ta:
                for c, dd, k in tb:
                    K = K.at[
                        d - dr0, dd - dc0, :,
                        (r * 2 + c) * cout : (r * 2 + c + 1) * cout,
                    ].set(w[j, k])
            kernels.append((K, (dr0, dr1), (dc0, dc1)))
    return kernels


def _conv2d_p2p_split(xp: jax.Array, w: jax.Array, padding: int, crop: int):
    """Sum of four per-input-phase convs == the dense embedded conv of
    conv2d_phase_to_phase (each group conv computes
    out[t] = sum_d K[d] x_group[t + d + crop] — the same alignment as the
    dense form's pads, so outputs add elementwise)."""
    cin = w.shape[2]
    out = None
    for g, (K, (dr0, dr1), (dc0, dc1)) in enumerate(_phase_p2p_split_kernels(w, padding)):
        z = lax.conv_general_dilated(
            xp[..., g * cin : (g + 1) * cin],
            K,
            (1, 1),
            ((-dr0 - crop, dr1 - crop), (-dc0 - crop, dc1 - crop)),
            dimension_numbers=DIMSPEC,
        )
        out = z if out is None else out + z
    return out


def _p2p_split_enabled(kh: int) -> bool:
    from floodgan_tpu.core.flags import p2p_split

    return kh >= 3 and p2p_split()


def conv2d_phase_to_phase(
    xp: jax.Array,
    w: jax.Array,
    padding: int,
    b: Optional[jax.Array] = None,
    crop: int = 0,
) -> jax.Array:
    """Stride-1 k x k conv evaluated ENTIRELY in 2x2 phase space: input
    and output are both phase-major space-to-depth tensors
    ((n, H/2, W/2, 4C) -> (n, H/2, W/2, 4*cout)).  The full-resolution
    image never exists — the point for the phase-space encoder stem
    (VERDICT r2 #8): at 2048^2 the reference stem's (N, H, W, 64) f32
    tensors are ~1GB each and the (N, H, W, 9) input pads 14x; their phase
    forms stay dense.

    Derivation: y[2t+r, 2u+c, co] = sum_{j,k,ci} w[j,k,ci,co]
    X[2t+r+j-p, 2u+c+k-p, ci].  Writing the input row index as 2(t+d)+a
    gives a = (r+j-p) mod 2, d = floor((r+j-p)/2), i.e. j = 2d + a + p - r.
    Embedding w's taps at phase-grid offset (d, d') for input-phase (a, b)
    and output-phase (r, c) yields ONE dense stride-1 conv over the 4C
    phase channels whose kernel extent covers d in [floor((r-p)/2),
    floor((r+k-1-p)/2)] — zero-padded where a (r, d, a) triple has no
    valid j.  ~2x the image-space MACs (the embedding is ~50% zeros) but
    4x the input lanes and no full-resolution tensor; numerically the
    same conv (golden-tested).  Gradients flow to ``w`` through the
    embedding's gathers.

    ``crop`` drops that many leading AND trailing phase rows/cols from
    the output by shrinking the conv padding instead of slicing —
    ``conv(...)[:, crop:-crop, crop:-crop]`` as one conv.  The round-3
    profile showed the post-conv halo crops of the phase stem/heads
    materializing the full padded-grid tensor and slicing it afterwards
    (and, in the backward, zero-padding the cotangent back up through a
    dynamic-update-slice): ~2.5 ms/step of pure layout traffic that a
    padding adjustment removes."""
    kh, kw, cin, cout = w.shape
    if kh != kw:
        raise ValueError("square kernels only")
    if xp.shape[-1] % 4:
        raise ValueError(f"phase input channels {xp.shape[-1]} not divisible by 4")
    if xp.shape[-1] // 4 != cin:
        raise ValueError(f"phase input implies cin={xp.shape[-1] // 4}, kernel has {cin}")
    if _p2p_split_enabled(kh):
        out = _conv2d_p2p_split(xp, w, padding, crop)
    else:
        wp, dmin, dmax = _phase_p2p_kernel(w, padding)
        out = lax.conv_general_dilated(
            xp,
            wp,
            (1, 1),
            ((-dmin - crop, dmax - crop), (-dmin - crop, dmax - crop)),
            dimension_numbers=DIMSPEC,
        )
    if b is not None:
        out = out + jnp.tile(b, 4)
    return out


def reflect_pad_phases(xp: jax.Array, pad: int, cin: int) -> jax.Array:
    """Image-level ReflectionPad2d(pad), pad ODD, computed directly on the
    2x2 phase-major decomposition — the padded image never materializes.

    An odd image pad flips phase parity, so the halo is materialized as
    ``pad+1`` (even) image rows = q = (pad+1)//2 phase rows per side; the
    consumer slices the one surplus image row off via its tap offsets (see
    AttentionGenerator's phase stem).  Source rows follow from the mirror
    maps: a padded phase row (s=-k, row-phase a) holds image rows
    2k-a = phase row (k - a, a); a bottom row (s=S-1+k) holds phase row
    (S - k - a, a) — per-phase-group slices, no transposes of the bulk.

    Routed through fused_grads.reflect_pad_phases (4D channel-block-slice
    construction + hand-written adjoint) under the custom-VJP policy: the
    6D-view construction below autodiffs into stack/reshape transposes
    whose (2, 2, C) trailing dims tile terribly on TPU — measured 18.8 ms
    vs 9.6 for the IMAGE-space pad at the 512^2-b8 head shapes
    (tools/microbench_phaseparts.py)."""
    if pad % 2 == 0:
        raise ValueError("reflect_pad_phases is derived for odd image pads")
    if _custom_vjp():
        from floodgan_tpu.ops import fused_grads

        if xp.shape[-1] != 4 * cin:
            raise ValueError(f"expected {4 * cin} phase channels, got {xp.shape[-1]}")
        return fused_grads.reflect_pad_phases(xp, pad, cin)
    q = (pad + 1) // 2
    n, S, T, c4 = xp.shape
    if c4 != 4 * cin:
        raise ValueError(f"expected {4 * cin} phase channels, got {c4}")
    x5 = xp.reshape(n, S, T, 2, 2, cin)  # (.., row-phase a, col-phase b, c)

    def prow(s0, s1):  # one padded phase row: a=0 from s0, a=1 from s1
        return jnp.stack([x5[:, s0, :, 0], x5[:, s1, :, 1]], axis=2)

    top = jnp.stack([prow(k, k - 1) for k in range(q, 0, -1)], axis=1)
    bot = jnp.stack([prow(S - k, S - k - 1) for k in range(1, q + 1)], axis=1)
    x5 = jnp.concatenate([top, x5, bot], axis=1)

    def pcol(t0, t1):  # one padded phase col: b=0 from t0, b=1 from t1
        return jnp.stack([x5[:, :, t0, :, 0], x5[:, :, t1, :, 1]], axis=3)

    left = jnp.stack([pcol(k, k - 1) for k in range(q, 0, -1)], axis=2)
    right = jnp.stack([pcol(T - k, T - k - 1) for k in range(1, q + 1)], axis=2)
    x5 = jnp.concatenate([left, x5, right], axis=2)
    return x5.reshape(n, S + 2 * q, T + 2 * q, 4 * cin)


def reflect_conv_phases(
    xp: jax.Array, w: jax.Array, b: Optional[jax.Array], pad: int, cin: int
) -> jax.Array:
    """conv2d_phase_to_phase(reflect_pad_phases(xp, pad, cin), w,
    padding=pad, crop=(pad+1)//2) as ONE composite — the phase-space
    analog of the trunk's reflect_conv2d.

    The explicit form materializes the (S+2q)^2 padded tensor (137 MB at
    the 512^2-b8 content head) and its backward scatters the padded
    cotangent back through per-row channel-block adds — together the
    single largest non-conv term left in the round-3 profile
    (reflect_pad_phases chain ~7 ms/step at head shapes,
    tools/microbench_phaseparts.py).  By linearity,
    conv(pad(x)) = conv(x, zero pad q) + conv(halo), and the halo is
    nonzero only on q phase rows/cols per side, so its contribution is
    four thin band convs (reach exactly q output rows/cols — O(q/S) of
    the interior work) added into the output borders.  The bands are the
    same channel-block row/col slices fused_grads._rpp_build constructs;
    autodiff of every piece is already the efficient form (the interior's
    d-input is a transposed conv at exactly (S, T) — no padded-width
    intermediate, no crop), so no custom VJP is needed.

    TPU-only (same rationale as reflect_conv2d): on XLA:CPU the band
    convs + border DUS-adds run slower than the monolithic pad+conv, so
    CPU keeps the explicit form.  Values are identical (golden-tested,
    forward and grads)."""
    # Domain check up front so the op's accepted shapes do not depend on
    # the backend (the composite's band geometry is derived for odd pad
    # with k = 2*pad+1 — the only shape the models use).
    if pad % 2 == 0 or w.shape[0] != 2 * pad + 1 or w.shape[0] != w.shape[1]:
        raise ValueError(
            f"reflect_conv_phases derived for odd pad with square k = 2*pad+1 "
            f"kernels (got k={w.shape[0]}x{w.shape[1]}, pad={pad})"
        )
    if _custom_vjp() and jax.default_backend() != "cpu":
        return _reflect_conv_phases_composite(xp, w, b, pad, cin)
    hp = reflect_pad_phases(xp, pad, cin)
    return conv2d_phase_to_phase(hp, w, padding=pad, b=b, crop=(pad + 1) // 2)


def _reflect_conv_phases_composite(xp, w, b, pad, cin):
    """See reflect_conv_phases.  Derivation of the band geometry: with
    Xp the (S+2q, T+2q) padded grid and wp the (ext, ext) embedded kernel
    (ext = 2q+1 for odd pad, k = 2*pad+1), the target equals
    lax.conv(Xp, wp, VALID): out[t] = sum_d wp[d] Xp[t+d].  Splitting
    Xp into the zero-embedded interior and the four halo strips gives
    the interior conv with symmetric padding q and, e.g. for the top
    strip (Xp rows 0..q-1), contributions only to outputs t < q:
    a conv over the q-row band with row padding (0, ext-1)."""
    q = (pad + 1) // 2
    C = cin
    n, S, T, c4 = xp.shape
    if c4 != 4 * C:
        raise ValueError(f"expected {4 * C} phase channels, got {c4}")
    wp, dmin, dmax = _phase_p2p_kernel(w, pad)
    if -dmin != q or dmax != q:
        raise ValueError(
            f"reflect_conv_phases derived for odd pad with k = 2*pad+1 "
            f"(got dmin={dmin}, dmax={dmax}, q={q})"
        )
    ext = dmax - dmin + 1
    e = ext - 1

    def conv(z, pads):
        return lax.conv_general_dilated(z, wp, (1, 1), pads, dimension_numbers=DIMSPEC)

    # The interior conv is the dominant cost (the 4.4 ms content-head term
    # of the round-3 profile); under FLOODGAN_P2P_SPLIT it runs as the four
    # per-input-phase convs (0.64x MACs — core/flags.p2p_split).  The halo
    # bands reach only q output rows/cols (O(q/S) of the work) and keep the
    # dense kernel.
    if _p2p_split_enabled(w.shape[0]):
        y = _conv2d_p2p_split(xp, w, pad, 0)
    else:
        y = conv(xp, ((q, q), (q, q)))
    if b is not None:
        y = y + jnp.tile(b, 4)

    # halo bands — the channel-block mirror slices of _rpp_build
    def prow(src, s0, s1):
        return jnp.concatenate(
            [src[:, s0 : s0 + 1, :, : 2 * C], src[:, s1 : s1 + 1, :, 2 * C :]], axis=-1
        )

    def pcol(src, t0, t1):
        return jnp.concatenate(
            [
                src[:, :, t0 : t0 + 1, 0:C],
                src[:, :, t1 : t1 + 1, C : 2 * C],
                src[:, :, t0 : t0 + 1, 2 * C : 3 * C],
                src[:, :, t1 : t1 + 1, 3 * C :],
            ],
            axis=-1,
        )

    top = jnp.concatenate([prow(xp, k, k - 1) for k in range(q, 0, -1)], axis=1)
    bot = jnp.concatenate([prow(xp, S - k, S - k - 1) for k in range(1, q + 1)], axis=1)

    def colext(band):
        left = jnp.concatenate([pcol(band, k, k - 1) for k in range(q, 0, -1)], axis=2)
        right = jnp.concatenate(
            [pcol(band, T - k, T - k - 1) for k in range(1, q + 1)], axis=2
        )
        return jnp.concatenate([left, band, right], axis=2)

    lb = jnp.concatenate([pcol(xp, k, k - 1) for k in range(q, 0, -1)], axis=2)
    rb = jnp.concatenate([pcol(xp, T - k, T - k - 1) for k in range(1, q + 1)], axis=2)

    y = y.at[:, :q].add(conv(colext(top), ((0, e), (0, 0))))
    y = y.at[:, S - q :].add(conv(colext(bot), ((e, 0), (0, 0))))
    y = y.at[:, :, :q].add(conv(lb, ((q, q), (0, e))))
    y = y.at[:, :, T - q :].add(conv(rb, ((q, q), (e, 0))))
    return y


def instance_norm_act_phases(
    xp: jax.Array,
    relu: bool = False,
    negative_slope: float = 0.0,
) -> jax.Array:
    """InstanceNorm(+activation) of an IMAGE represented in 2x2 phase-major
    space-to-depth form (n, H/2, W/2, 4C): statistics per (n, c) pool over
    (H/2, W/2) AND the 4 phase copies of each channel (equal-sized groups,
    so the mean of per-phase means is the image mean — exact).  The
    normalize/activation chain runs on the phase layout directly; the
    full-resolution tensor never materializes."""
    n, h2, w2, c4 = xp.shape
    cin = c4 // 4
    if _custom_vjp():
        from floodgan_tpu.ops import fused_grads

        return fused_grads.in_act_phases(xp, cin, relu, negative_slope)
    dt = xp.dtype
    x32 = xp.astype(jnp.float32)
    # per-(n, phase*channel) one-pass stats, then average the 4 phase groups
    mean_p = jnp.mean(x32, axis=(1, 2))                  # (n, 4C)
    meansq_p = jnp.mean(x32 * x32, axis=(1, 2))          # (n, 4C)
    mean = jnp.mean(mean_p.reshape(n, 4, cin), axis=1)   # (n, C)
    meansq = jnp.mean(meansq_p.reshape(n, 4, cin), axis=1)
    inv = lax.rsqrt(meansq - mean * mean + 1e-5)
    mean4 = jnp.tile(mean, (1, 4))[:, None, None, :]
    inv4 = jnp.tile(inv, (1, 4))[:, None, None, :]
    if dt == jnp.bfloat16 and _norm_arith_bf16():
        y = (xp - mean4.astype(dt)) * inv4.astype(dt)
        if relu:
            y = jnp.where(y >= 0, y, y * jnp.asarray(negative_slope, dt))
        return y
    y = (x32 - mean4) * inv4
    if relu:
        y = jnp.where(y >= 0.0, y, y * negative_slope)
    return y.astype(dt)


def reflect_conv2d(x: jax.Array, w: jax.Array, b=None, pad: int = 1) -> jax.Array:
    """conv2d(reflect_pad2d(x, pad), w, b) for odd k = 2*pad+1 kernels (the
    trunk's pad-1 3x3 shape).  Under the custom-VJP policy this routes to
    the composite backward in fused_grads.reflect_conv2d: autodiff of the
    pad+conv pair computes d-input as a full-padding transposed conv at
    (H+2p)^2 and then crops — XLA materializes the padded-width tensor and
    slices it (18 x 0.21 ms/step across the trunk backward, round-3
    profile).  The composite emits the interior at exactly (H, W) plus
    four thin band corrections.

    TPU-only: on XLA:CPU the band convs + row/col scatter-adds run
    SLOWER than the monolithic transposed conv (and pushed the 1-core
    virtual-mesh dryrun's cycle step past the 40 s collective-rendezvous
    watchdog); the composite is a TPU tiling fix, so CPU keeps the
    autodiff lowering."""
    if _custom_vjp() and jax.default_backend() != "cpu":
        from floodgan_tpu.ops import fused_grads

        return fused_grads.reflect_conv2d(x, w, b, pad)
    return conv2d(reflect_pad2d(x, pad), w, b, stride=1, padding=0)


def space_to_depth_phases(x: jax.Array) -> jax.Array:
    """(n, H, W, C) -> (n, H/2, W/2, 4C), channel index (r*2+c)*C + ch for
    spatial phase (r, c) — the phase convention of the phase-fold convs.

    Lowering note (measured, tools/microbench_s2d.py, real chip, 512^2
    b8): this 6D reshape/transpose view is the FASTER form — 3.08 ms
    (bf16 9ch) / 2.41 (f32 3ch) vs 7.14 / 3.21 for a 4D strided-slice
    channel-concat.  Unlike the reflect-pad case, strided H/W slices of a
    lane-padded few-channel tensor read worse than the trailing-dim
    transpose, so the pattern that fixed reflect_pad_phases does NOT
    transfer here (kept as ``_s2d_slices`` for the record)."""
    return _space_to_depth_phases_6d(x)


def _s2d_slices(x):
    """Measured-and-rejected alternative lowering (see above)."""
    return jnp.concatenate(
        [x[:, r::2, c::2, :] for r in (0, 1) for c in (0, 1)], axis=-1
    )


def _space_to_depth_phases_6d(x: jax.Array) -> jax.Array:
    n, H, W, C = x.shape
    xs = x.reshape(n, H // 2, 2, W // 2, 2, C)
    return xs.transpose(0, 1, 3, 2, 4, 5).reshape(n, H // 2, W // 2, 4 * C)


def _compose_selectors():
    """Constant 0/1 matrices for the flat-channel phase compose (below).
    Channel conventions (phase-major): content (…, 108) = [p(4), k(9), c(3)],
    logits (…, 40) = [p(4), k(10)] with k=9 the background mask, rgb/out
    (…, 12) = [p(4), c(3)]."""
    import numpy as np

    P, K, C = 4, 10, 3
    b_max = np.zeros((P, P * K), np.float32)          # (…,4) max -> (…,40)
    b_den = np.zeros((P * K, P), np.float32)          # (…,40) e -> (…,4) sum
    b_fg = np.zeros((P * K, P * (K - 1) * C), np.float32)   # e -> content lanes
    b_bg = np.zeros((P * K, P * C), np.float32)       # e[k=9] -> rgb lanes
    b_sum = np.zeros((P * (K - 1) * C, P * C), np.float32)  # sum over k
    b_dnorm = np.zeros((P, P * C), np.float32)        # (…,4) 1/d -> (…,12)
    b_bgm = np.zeros((P * K, P), np.float32)          # e[k=9] -> (…,4)
    for p in range(P):
        for k in range(K):
            b_max[p, p * K + k] = 1
            b_den[p * K + k, p] = 1
        b_bgm[p * K + K - 1, p] = 1
        for c in range(C):
            b_bg[p * K + K - 1, p * C + c] = 1
            b_dnorm[p, p * C + c] = 1
            for k in range(K - 1):
                b_fg[p * K + k, p * ((K - 1) * C) + k * C + c] = 1
                b_sum[p * ((K - 1) * C) + k * C + c, p * C + c] = 1
    return tuple(jnp.asarray(b) for b in (b_max, b_den, b_fg, b_bg, b_sum, b_dnorm, b_bgm))


def attention_compose_phases(content_p: jax.Array, logits_p: jax.Array, rgb_p: jax.Array):
    """Attention composition on FLAT phase-major channel layouts.

    Same math as softmax(logits) -> 9-way content MAC + background blend
    (reference model_architectures.py:227-258), expressed entirely on
    (…, 108)/(…, 40)/(…, 12) channel-flat tensors: the per-phase softmax
    and the k-contraction become multiplies with constant 0/1 matrices
    (tiny MXU matmuls) instead of reshapes to (…, 4, 10)/(…, 4, 9, 3) —
    whose 5-D minor dims tile terribly on TPU (the round-3 profile shows
    a 4.8 ms/step layout copy of the (…, 4, 10) logits alone, plus the
    padded softmax/einsum fusions).  Normalisation is applied once at the
    end: out = (Σ_k c_k e_k + rgb e_bg) / Σ_k e_k with e = exp(l - max),
    identical to softmax-then-MAC up to float reassociation.

    content_p: (n, S, T, 108) tanh'd content phases; logits_p: (n, S, T, 40)
    mask logits; rgb_p: (n, S, T, 12) input RGB phases.
    Returns (out (n, S, T, 12) f32, background mask (n, S, T, 4) f32).
    """
    b_max, b_den, b_fg, b_bg, b_sum, b_dnorm, b_bgm = _compose_selectors()
    l32 = logits_p.astype(jnp.float32)
    m = jnp.max(l32.reshape(*l32.shape[:3], 4, 10), axis=-1)  # (…,4) — small
    e = jnp.exp(l32 - m @ b_max)                              # (…,40) f32, <= 1
    d = e @ b_den                                             # (…,4)
    cdt = content_p.dtype
    num = content_p * (e @ b_fg).astype(cdt)                  # (…,108)
    fg_un = (num @ b_sum.astype(cdt)).astype(jnp.float32)     # (…,12), |.| <= 9
    bg_un = rgb_p.astype(jnp.float32) * (e @ b_bg)            # (…,12)
    recip = 1.0 / d
    out = (fg_un + bg_un) * (recip @ b_dnorm)
    bg_mask = (e @ b_bgm) * recip
    return out, bg_mask


@jax.jit
def s2d_batch(input_stack: jax.Array, output_image: jax.Array):
    """Phase-major conversion of one (input, output) training batch — the
    shared body of the trainers' pipeline-side ``prepare_batch``."""
    return space_to_depth_phases(input_stack), space_to_depth_phases(output_image)


def concat_channels_phases(parts) -> jax.Array:
    """Channel concat of phase-major tensors: parts is [(p_i, c_i), ...]
    with p_i of shape (n, S, T, 4*c_i); returns (n, S, T, 4*sum(c_i)) in the
    same phase-major convention (phase is the OUTER factor of the channel
    index, so a trailing-dim concat would interleave wrongly — each part
    must be viewed as (..., 4, c_i) first)."""
    views = [p.reshape(*p.shape[:3], 4, c) for p, c in parts]
    out = jnp.concatenate(views, axis=-1)
    return out.reshape(*out.shape[:3], -1)


def slice_channels_phases(p: jax.Array, cin: int, lo: int, hi: int) -> jax.Array:
    """Phase-major channel slice [lo:hi) of a (n, S, T, 4*cin) tensor —
    the phase form of ``x[..., lo:hi]``."""
    v = p.reshape(*p.shape[:3], 4, cin)[..., lo:hi]
    return v.reshape(*p.shape[:3], 4 * (hi - lo))


def depth_to_space_phases(p: jax.Array, out_h: int, out_w: int, cout: int) -> jax.Array:
    """Inverse of :func:`space_to_depth_phases` (with trailing-row/col trim
    when out_h/out_w are smaller than twice the phase grid)."""
    n = p.shape[0]
    p = p.reshape(n, p.shape[1], p.shape[2], 2, 2, cout)
    out = p.transpose(0, 1, 3, 2, 4, 5).reshape(n, 2 * p.shape[1], 2 * p.shape[2], cout)
    return out[:, :out_h, :out_w]


def conv_transpose2d_phase_out(
    x: jax.Array,
    w: jax.Array,
    b: Optional[jax.Array] = None,
    padding: int = 1,
    output_padding: int = 0,
) -> jax.Array:
    """Stride-2 ConvTranspose2d emitting its output directly in 2x2
    phase-major space-to-depth form (n, out_h/2, out_w/2, 4*cout) — the
    subpixel decomposition IS the phase decomposition, so this is
    ``_conv_transpose_subpixel2`` minus the interleave: four dense
    stride-1 convs, no dilated conv, no full-resolution tensor.  Feeds
    ``instance_norm_act_phases`` / ``conv2d_phase_to_phase`` consumers
    (the phase decoder head).  Requires even output dims."""
    kh, kw, cin, cout = w.shape
    n, h, wdt, _ = x.shape
    pad_lo = kh - 1 - padding
    out_h = (2 * h - 1) + 2 * pad_lo + output_padding - kh + 1
    out_w = (2 * wdt - 1) + 2 * pad_lo + output_padding - kw + 1
    if out_h % 2 or out_w % 2:
        raise ValueError(f"phase output needs even dims, got {out_h}x{out_w}")
    import os

    if os.environ.get("FLOODGAN_PHASE_OUT_SPLIT") == "1":
        phases = _conv_transpose_subpixel2_phases(x, w, padding, output_padding)
        out = jnp.concatenate(
            [phases[(r, c)] for r in (0, 1) for c in (0, 1)], axis=-1
        )
    else:
        out = _conv_transpose_phase_out_merged(x, w, padding, output_padding)
    if b is not None:
        out = out + jnp.tile(b, 4)
    return out


def _conv_transpose_phase_out_merged(
    x: jax.Array, w: jax.Array, padding: int, output_padding: int
) -> jax.Array:
    """All four output phases of a stride-2 ConvTranspose in ONE stride-1
    conv with 4*cout output channels (phase-major).

    The 4-conv subpixel split (``_conv_transpose_subpixel2_phases``) emits
    cout=64-channel outputs in this model family — each conv fills only
    half the 128 MXU lanes.  Folding the phases into the channel dim makes
    one conv with 4*cout=256 outputs over the union tap window: output
    phase r at phase-position t draws flipped-W tap j from input index
    t + d with d = (r + j - pad_lo)/2, i.e. j = 2d - r + pad_lo.  The
    union of the per-phase d-windows is [dmin, dmax]; slots with no valid
    j for a phase are zero (9/16 dense for the model's k3 s2 p1 op1 —
    still fewer executed lane-MACs than either the 4-conv split or the
    lhs-dilated image-space lowering, measured in
    tools/microbench_phasehead.py).  Gradients flow to ``w`` through the
    kernel-assembly gathers."""
    kh, kw, cin, cout = w.shape
    if kh != kw:
        raise ValueError("square kernels only")
    n, h, wdt, _ = x.shape
    pad_lo = kh - 1 - padding
    wf = jnp.flip(w, (0, 1))
    dspec = {}
    dmin, dmax = 0, 0
    for r in (0, 1):
        ds = [
            (r + j - pad_lo) // 2
            for j in range(kh)
            if (r + j - pad_lo) % 2 == 0
        ]
        dspec[r] = ds
        dmin = min(dmin, min(ds))
        dmax = max(dmax, max(ds))
    ext = dmax - dmin + 1
    K = jnp.zeros((ext, ext, cin, 4 * cout), w.dtype)
    for r in (0, 1):
        for c in (0, 1):
            o = (r * 2 + c) * cout
            for d in dspec[r]:
                j = 2 * d - r + pad_lo
                for dd in dspec[c]:
                    k = 2 * dd - c + pad_lo
                    K = K.at[d - dmin, dd - dmin, :, o : o + cout].set(wf[j, k])
    out_h = (2 * h - 1) + 2 * pad_lo + output_padding - kh + 1
    out_w = (2 * wdt - 1) + 2 * pad_lo + output_padding - kw + 1
    out = lax.conv_general_dilated(
        x,
        K,
        (1, 1),
        ((-dmin, dmax), (-dmin, dmax)),
        dimension_numbers=DIMSPEC,
    )
    return out[:, : out_h // 2, : out_w // 2]


def conv_transpose2d(
    x: jax.Array,
    w: jax.Array,
    b: Optional[jax.Array] = None,
    stride: int = 2,
    padding: int = 1,
    output_padding: int = 0,
    method: Optional[str] = None,  # None=auto | "dilated" | "subpixel"
) -> jax.Array:
    """torch.nn.ConvTranspose2d twin.

    ``w`` is (kh, kw, C_in, C_out); torch's (C_in, C_out, kh, kw) maps via
    ``w_torch.permute(2, 3, 0, 1)``.  Output size: (in-1)*s - 2p + k + op,
    identical to torch (reference generators use k4 s2 p1 and
    k3 s2 p1 op1, both 2x).

    Two lowerings, numerically identical:
    - "dilated": cross-correlate(dilate(x, s) padded with
      (k-1-p, k-1-p+op), spatial-flip(W)) — one lhs-dilated XLA conv.
    - "subpixel": decompose the stride-2 transpose into s*s ordinary
      stride-1 convs (one per output phase) + pixel-shuffle interleave;
      every conv is dense on the MXU with no dilation.  Measured a WASH
      on v5e (3.7 vs 3.8 ms at the deconv1 shape, BENCH_NOTES round 1 —
      XLA already lowers lhs-dilation well), so the default stays
      "dilated"; FLOODGAN_SUBPIXEL_CONVT=1 opts in for re-measurement.
    """
    if method is None:
        import os

        method = "subpixel" if os.environ.get("FLOODGAN_SUBPIXEL_CONVT") == "1" else "dilated"
    if method == "subpixel" and stride == 2:
        out = _conv_transpose_subpixel2(x, w, padding, output_padding)
    else:
        kh, kw = w.shape[0], w.shape[1]
        out = lax.conv_general_dilated(
            x,
            jnp.flip(w, (0, 1)),
            window_strides=(1, 1),
            padding=(
                (kh - 1 - padding, kh - 1 - padding + output_padding),
                (kw - 1 - padding, kw - 1 - padding + output_padding),
            ),
            lhs_dilation=(stride, stride),
            dimension_numbers=DIMSPEC,
        )
    if b is not None:
        out = out + b
    return out


def _conv_transpose_subpixel2_phases(
    x: jax.Array, w: jax.Array, padding: int, output_padding: int
) -> dict:
    """The four output phases of a stride-2 ConvTranspose, each as an
    ordinary stride-1 conv (see ``_conv_transpose_subpixel2``): returns
    {(r, c): (n, ph_h, ph_w, cout)}."""
    kh, kw, cin, cout = w.shape
    wf = jnp.flip(w, (0, 1))
    n, h, wdt, _ = x.shape
    pad_lo_h = kh - 1 - padding
    pad_hi_h = kh - 1 - padding + output_padding
    out_h = (2 * h - 1) + pad_lo_h + pad_hi_h - kh + 1
    out_w = (2 * wdt - 1) + pad_lo_h + pad_hi_h - kw + 1
    phases = {}
    for r in (0, 1):
        for c in (0, 1):
            # dilated-domain positions congruent to (r, c) mod 2: the taps
            # hitting real input samples are those where (m + j - pad_lo)
            # is even; sub-sample the flipped kernel accordingly.
            taps_h = [j for j in range(kh) if (r + j - pad_lo_h) % 2 == 0]
            taps_w = [j for j in range(kw) if (c + j - pad_lo_h) % 2 == 0]
            sub = wf[jnp.array(taps_h)][:, jnp.array(taps_w)]
            # input start index for tap j at output phase position t:
            # i = (m + j - pad_lo)/2 with m = 2t + r
            sh = (r + taps_h[0] - pad_lo_h) // 2
            sw = (c + taps_w[0] - pad_lo_h) // 2
            ph_h = (out_h - r + 1) // 2
            ph_w = (out_w - c + 1) // 2
            # conv over x with left-pad so i may start negative
            lo_h = max(0, -sh)
            lo_w = max(0, -sw)
            need_h = sh + ph_h - 1 + len(taps_h) - 1
            need_w = sw + ph_w - 1 + len(taps_w) - 1
            hi_h = max(0, need_h - (h - 1))
            hi_w = max(0, need_w - (wdt - 1))
            xp = jnp.pad(x, ((0, 0), (lo_h, hi_h), (lo_w, hi_w), (0, 0)))
            xs = xp[:, sh + lo_h : sh + lo_h + ph_h + len(taps_h) - 1,
                    sw + lo_w : sw + lo_w + ph_w + len(taps_w) - 1]
            phases[(r, c)] = lax.conv_general_dilated(
                xs, sub, (1, 1), "VALID", dimension_numbers=DIMSPEC
            )
    return phases


def _conv_transpose_subpixel2(
    x: jax.Array, w: jax.Array, padding: int, output_padding: int
) -> jax.Array:
    """Stride-2 ConvTranspose as 4 phase convs + interleave.

    With the dilated formulation, output position m draws from flipped-W
    taps at dilated-input offsets; splitting m by parity in each spatial
    dim yields, per phase (r, c) ∈ {0,1}², an ordinary stride-1 conv whose
    kernel is the (flipped) W sub-sampled at alternating taps.  The phase
    results interleave back with a reshape (pixel shuffle).
    """
    kh, kw, cin, cout = w.shape
    n, h, wdt, _ = x.shape
    pad_lo_h = kh - 1 - padding
    pad_hi_h = kh - 1 - padding + output_padding
    # dilated input has 2n-1 samples; out = (2n-1) + pads - k + 1
    out_h = (2 * h - 1) + pad_lo_h + pad_hi_h - kh + 1
    out_w = (2 * wdt - 1) + pad_lo_h + pad_hi_h - kw + 1
    phases = _conv_transpose_subpixel2_phases(x, w, padding, output_padding)
    # interleave: out[2t+r, 2u+c] = phases[(r,c)][t,u]
    eh = (out_h + 1) // 2
    ew = (out_w + 1) // 2

    def padded(p, r, c):
        ph, pw = p.shape[1], p.shape[2]
        return jnp.pad(p, ((0, 0), (0, eh - ph), (0, ew - pw), (0, 0)))

    grid = jnp.stack(
        [
            jnp.stack([padded(phases[(r, 0)], r, 0), padded(phases[(r, 1)], r, 1)], axis=3)
            for r in (0, 1)
        ],
        axis=2,
    )  # (n, eh, 2, ew, 2, cout)
    out = grid.reshape(n, 2 * eh, 2 * ew, cout)
    return out[:, :out_h, :out_w]


def batch_norm(
    x: jax.Array,
    scale: jax.Array,
    bias: jax.Array,
    eps: float = 1e-5,
) -> jax.Array:
    """torch.nn.BatchNorm2d in *training mode* — batch statistics over
    (N, H, W), biased variance.

    The reference never calls ``.eval()`` on its networks, so batch-stats
    normalisation applies at inference too (reference models/model.py:393,
    497, 579 pin the RNG instead; SURVEY.md §2.7).  Running statistics are
    therefore deliberately not tracked: they would never be consumed.

    Statistics accumulate in f32 regardless of activation dtype (bf16
    compute policy keeps norms stable).
    """
    if _custom_vjp():
        from floodgan_tpu.ops import fused_grads

        return fused_grads.batch_norm(x, scale, bias)
    dt = x.dtype
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=(0, 1, 2), keepdims=True)
    var = jnp.var(x32, axis=(0, 1, 2), keepdims=True)
    inv = lax.rsqrt(var + eps)
    if dt == jnp.bfloat16 and _norm_arith_bf16():
        # f32 statistics, bf16 normalize chain (see instance-norm note in
        # ops/pallas_kernels.py — halves the elementwise pass width).
        return (x - mean.astype(dt)) * (inv.astype(dt) * scale.astype(dt)) + bias.astype(dt)
    return ((x32 - mean) * inv * scale.astype(jnp.float32) + bias.astype(jnp.float32)).astype(dt)


def _norm_arith_bf16() -> bool:
    from floodgan_tpu.core.flags import norm_arith_bf16

    return norm_arith_bf16()


def _custom_vjp() -> bool:
    from floodgan_tpu.core.flags import custom_vjp_norms

    return custom_vjp_norms()


def instance_norm(x: jax.Array, eps: float = 1e-5) -> jax.Array:
    """torch.nn.InstanceNorm2d twin (default affine=False,
    track_running_stats=False): per-(N, C) statistics over (H, W),
    biased variance.  f32 statistics under the bf16 compute policy;
    E[x^2]-E[x]^2 form so both reductions fuse into one pass."""
    dt = x.dtype
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=(1, 2), keepdims=True)
    meansq = jnp.mean(x32 * x32, axis=(1, 2), keepdims=True)
    var = meansq - mean * mean
    inv = lax.rsqrt(var + eps)
    if dt == jnp.bfloat16 and _norm_arith_bf16():
        return (x - mean.astype(dt)) * inv.astype(dt)
    return ((x32 - mean) * inv).astype(dt)


def instance_norm_act(
    x: jax.Array,
    relu: bool = False,
    residual: Optional[jax.Array] = None,
    negative_slope: float = 0.0,
) -> jax.Array:
    """IN(+activation)(+residual) with Pallas fusion on TPU backends
    (ops/pallas_kernels.py) and the jnp path elsewhere — numerics are
    identical (golden-tested both ways)."""
    from floodgan_tpu.core.flags import use_pallas
    from floodgan_tpu.ops import pallas_kernels as pk

    if use_pallas("in"):
        return pk.fused_instance_norm(
            x, residual=residual, relu=relu, negative_slope=negative_slope
        )
    if _custom_vjp():
        from floodgan_tpu.ops import fused_grads

        if residual is None:
            return fused_grads.in_act(x, relu, negative_slope)
        return fused_grads.in_act_res(x, residual, relu, negative_slope)
    return pk._instance_norm_jnp(x, residual, relu, 1e-5, negative_slope)


def reflect_pad2d(x: jax.Array, pad: int) -> jax.Array:
    """torch.nn.ReflectionPad2d / F.pad(mode='reflect') twin on H, W."""
    if _custom_vjp():
        from floodgan_tpu.ops import fused_grads

        return fused_grads.reflect_pad2d(x, pad)
    return jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)), mode="reflect")


def leaky_relu(x: jax.Array, negative_slope: float = 0.2) -> jax.Array:
    return jnp.where(x >= 0, x, x * negative_slope)


def dropout(x: jax.Array, rate: float, rng: jax.Array, deterministic: bool = False) -> jax.Array:
    """torch.nn.Dropout twin (inverted dropout).  The reference keeps
    dropout active at inference under a fixed seed (SURVEY.md §2.7), so
    callers pass ``deterministic=False`` with the fixed inference key."""
    if deterministic or rate == 0.0:
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(rng, p=keep, shape=x.shape)
    return jnp.where(mask, x / keep, jnp.zeros_like(x))


def max_pool2d_phases(xp: jax.Array, cin: int) -> jax.Array:
    """Image-level MaxPool2d(2) evaluated on a 2x2 phase-major tensor.

    The 2x2 stride-2 pool window at output pixel (i, j) contains exactly
    the four image pixels the phase decomposition stores at phase-grid
    position (i, j), so the pool is an elementwise max across the four
    phase blocks — no window reduction, no full-resolution tensor.  The
    output is the ordinary IMAGE tensor at (n, H/2, W/2, cin): pooling is
    where the segmentation stem exits phase space (models/unet.py).
    Exact for even H, W (the decomposition's own requirement).

    Tie routing: the backward scatters each cotangent to the FIRST phase
    attaining the max (custom VJP) — the same subgradient the image-space
    ``max_pool2d`` (XLA select-and-scatter) and torch's MaxPool2d pick,
    and the phase-major channel order IS the window's (row, col) scan
    order.  This matters in practice: after BN+relu ~7% of stem windows
    are all-zero ties, and ``jnp.max``'s even-split subgradient would
    silently diverge the training trajectory between lowerings."""
    n, h, w, c4 = xp.shape
    if c4 != 4 * cin:
        raise ValueError(f"phase input has {c4} channels, expected {4 * cin}")
    return _max_phases(xp.reshape(n, h, w, 4, cin))


@jax.custom_vjp
def _max_phases(v: jax.Array) -> jax.Array:
    return jnp.max(v, axis=3)


def _max_phases_fwd(v):
    m = jnp.max(v, axis=3)
    return m, jnp.argmax(v, axis=3).astype(jnp.int8)  # argmax = first max


def _max_phases_bwd(idx, g):
    sel = idx[:, :, :, None, :] == jnp.arange(4, dtype=jnp.int8)[None, None, None, :, None]
    return (jnp.where(sel, g[:, :, :, None, :], 0).astype(g.dtype),)


_max_phases.defvjp(_max_phases_fwd, _max_phases_bwd)


def max_pool2d(x: jax.Array, window: int = 2, stride: Optional[int] = None) -> jax.Array:
    """torch.nn.MaxPool2d(window) twin (no padding)."""
    stride = stride or window
    return lax.reduce_window(
        x,
        -jnp.inf,
        lax.max,
        window_dimensions=(1, window, window, 1),
        window_strides=(1, stride, stride, 1),
        padding="VALID",
    )


def pad_to_match(x: jax.Array, target_h: int, target_w: int) -> jax.Array:
    """torch F.pad([dX//2, dX-dX//2, dY//2, dY-dY//2]) twin used by the
    segmentation U-Net up-path (reference model_architectures.py:575-578)."""
    dh = target_h - x.shape[1]
    dw = target_w - x.shape[2]
    return jnp.pad(
        x,
        ((0, 0), (dh // 2, dh - dh // 2), (dw // 2, dw - dw // 2), (0, 0)),
    )
