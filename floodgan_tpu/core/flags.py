"""Runtime feature flags.

Every flag here was DEFAULTED BY MEASUREMENT on a real v5e chip (the
measurement for each lives in BENCH_NOTES.md; the README's performance
table summarizes them).  All boolean flags accept the same value
conventions: 1/true/on/yes enable, 0/false/off/no/"" disable
(case-insensitive), so e.g. FLOODGAN_PHASE_HEAD=off and
FLOODGAN_CUSTOM_VJP=off behave consistently.

Taxonomy (every flag is one of three kinds; the per-flag docstrings
carry the measurement record):

- MEASURED DEFAULTS (on unless overridden): PHASE_HEAD, CUSTOM_VJP,
  NORM_BF16, XLA_OPTIONS, POST_CACHE, plus FLOODGAN_PHASEFOLD /
  FLOODGAN_CYCLE_PHASE / FLOODGAN_PHASE_STEP / FLOODGAN_PHASE_STEM /
  FLOODGAN_TRUNK_UNROLL read at their op/trainer sites.
- MEASURED-AND-REJECTED lowerings, kept opt-in as the measured record
  with golden tests (default OFF; enabling is for re-measurement on
  other backends/XLA versions, each REGRESSES the v5e headline):
  PALLAS, FLAT_COMPOSE, MERGED_DECONV1, P2P_SPLIT, MXU_STATS,
  SEG_PHASE, plus FLOODGAN_PHASEFOLD_S2 / FLOODGAN_SUBPIXEL_CONVT /
  FLOODGAN_PHASE_OUT_SPLIT at their op sites.  Guarded against
  composition bugs by tests/test_flag_matrix.py (each flag x the
  default step composition — motivated by the round-4
  concat_channels_phases shadowing bug, commit 0638851).
- UTILITY (behavioral switches, not perf lowerings): WIRE_DTYPE,
  DECODE_CACHE_BYTES, POST_CACHE_BYTES, DISABLE_NATIVE, CYCLE_PHASE_D,
  SERVE_MAX_BATCH, BENCH_STRICT, PIPELINE_DATA, LPIPS_WEIGHTS,
  LPIPS_FALLBACK.
"""

from __future__ import annotations

import os

_PALLAS_KERNELS = {"in", "compose"}

_TRUTHY = ("1", "true", "on", "yes")
_FALSY = ("0", "false", "off", "no", "")


def _env_bool(name: str, default: bool) -> bool:
    """Parse a boolean env flag with one shared convention; unknown values
    raise rather than silently flipping a measured default."""
    env = os.environ.get(name)
    if env is None:
        return default
    v = env.lower()
    if v in _TRUTHY:
        return True
    if v in _FALSY:
        return False
    raise ValueError(
        f"{name}: unrecognized value {env!r}; expected one of "
        f"{_TRUTHY + _FALSY}"
    )


def use_pallas(which: str = "") -> bool:
    """Whether to route ``which`` ("in" | "compose" | "" = any) through the
    Pallas kernels.  FLOODGAN_PALLAS accepts 0/1 or a comma list of kernel
    names ("in", "compose") for per-kernel selection.

    Default: OFF everywhere.  Measured on a real v5e chip (BENCH_NOTES.md
    round 2): the full 512^2 train step runs 37.0 samples/s with XLA's own
    fusion vs 22.4 with the Pallas kernels enabled — XLA fuses the IN
    chains and the compose head into the surrounding convolutions, which
    the standalone kernels (extra HBM round trips at the call boundaries)
    cannot beat.  The kernels stay available for exotic shapes/backends via
    this flag and remain golden-tested.
    """
    env = os.environ.get("FLOODGAN_PALLAS")
    if env is None:
        return False
    if env.lower() in ("0", "false", "off", "no", ""):
        return False
    if env.lower() in ("1", "true", "on", "yes"):
        return True
    names = {s.strip().lower() for s in env.split(",") if s.strip()}
    unknown = names - _PALLAS_KERNELS
    if unknown:
        # A typo ("inn") or stale kernel name must not silently flip every
        # Pallas path on (ADVICE r2) — reject it loudly.
        raise ValueError(
            f"FLOODGAN_PALLAS: unknown kernel name(s) {sorted(unknown)}; "
            f"expected 0/1/true/false or a comma list of {sorted(_PALLAS_KERNELS)}"
        )
    return (which or "in") in names or not which


def phase_head() -> bool:
    """Whether the attention decoder heads run in phase space end to end
    (ConvTranspose2 emits phases, IN/relu and the k7/k1 head convs consume
    them — no full-resolution tensor in either head).

    Default ON since round 3: the first phase-head build measured SLOWER
    than the image-space head (50.79 vs 54.07 samples/s — BENCH_NOTES),
    but the loss was entirely in two support ops, both fixed
    (tools/microbench_phaseparts.py, real chip, 512^2-b8 head shapes):
    reflect_pad_phases 18.8 -> 7.0 ms (4D channel-block construction +
    hand adjoint vs autodiff through 6D stacked views), IN-phases
    4.3 -> 2.3 ms (closed-form VJP), plus the one-conv phase_out
    ConvTranspose (4.4 vs 5.6 ms dilated / 4-conv split).  The full
    content-head chain now measures 23.7 ms phase vs 27.3 image-space.
    FLOODGAN_PHASE_HEAD=0 reverts to the image-space decoder heads."""
    return _env_bool("FLOODGAN_PHASE_HEAD", True)


def seg_phase() -> bool:
    """Whether the segmentation U-Net's full-resolution stem and tail run
    in 2x2 phase space (models/unet.py): the inc DoubleConv, the up4
    ConvTranspose+DoubleConv and the 1x1 outc all evaluate on
    space-to-depth tensors — (H/2, W/2, 4C) instead of (H, W, C).

    Why tried: the U-Net's 512^2-level convs carry 64 channels, half the
    128 MXU lanes, and are the measured gap between the seg family
    (49.6% MFU) and the headline (63%).  Their phase forms are
    256-channel convs at quarter the rows — full lanes.  The 2x2 maxpool
    that ends the stem is an elementwise max over the four phase blocks
    (ops.max_pool2d_phases) and the k2 s2 up-conv emits phases as four
    dense taps (ops.conv_transpose2d_phase_out), so neither end of the
    net ever materializes a full-resolution 64-channel tensor.
    Parameters are the ordinary image-space kernels either way —
    checkpoints are layout-independent (golden-tested in
    tests/test_seg_phase.py).

    Default OFF — measured-and-REJECTED on v5e (512^2 b16, BENCH_NOTES
    round 4): 76.49 samples/s phase vs 85.11 image-space.  The k3
    phase-to-phase embedding executes 64 cin*cout MACs per phase cell
    where the image conv does 36 (1.78x — and the k3 per-input-phase
    split form removes none of it, unlike k5/k7), which cancels the 2x
    lane win and loses ~10% net.  Phase space pays off for k5/k7 stems
    over few-channel inputs (the attention family), not for k3 over
    64-channel levels.  FLOODGAN_SEG_PHASE=1 enables for re-measurement
    on other backends."""
    return _env_bool("FLOODGAN_SEG_PHASE", False)


def flat_compose() -> bool:
    """Whether the phase-space attention composition runs on flat channel
    layouts (constant 0/1-matrix matmuls for the per-phase softmax and
    k-contraction, ops/nn_ops.py attention_compose_phases) instead of
    reshaping to (…, 4, 10)/(…, 4, 9, 3).  Same math to float
    reassociation (golden-tested).

    Default OFF — measured-and-rejected on v5e (512^2 b8 headline: 61.87
    vs 63.60 samples/s): the 5-D layout copies the flat form removes
    (e.g. the 4.8 ms/step logits copy in the round-3 profile) are async
    DMAs XLA already overlaps with compute, while the selector matmuls
    and broadcast chains add real critical-path time.
    FLOODGAN_FLAT_COMPOSE=1 enables for re-measurement on other
    hardware/XLA versions."""
    return _env_bool("FLOODGAN_FLAT_COMPOSE", False)


def merged_deconv1() -> bool:
    """Whether the attention generator's content and attention deconv1
    (two ConvTranspose 256->128 over the SAME trunk output) run as ONE
    conv pass with concatenated kernels (+ one instance norm over the
    256 concatenated channels — per-channel statistics, so exactly the
    two separate norms).  Parameters/checkpoints identical either way.

    Default OFF — measured-and-REJECTED on v5e (512^2 b8 headline,
    BENCH_NOTES round 3): 64.23 samples/s merged vs 65.45 separate.
    Merging SERIALISES the two head branches at their entry point —
    separate deconv1s let XLA overlap the content and attention chains,
    and the duplicated trunk read was already an async DMA riding under
    compute.  Kept opt-in as the measured record.
    FLOODGAN_MERGED_DECONV1=1 enables for re-measurement."""
    return _env_bool("FLOODGAN_MERGED_DECONV1", False)


def p2p_split() -> bool:
    """Whether the stride-1 phase-to-phase convs with k >= 3 (the k7 stem
    and content-head lowerings) run as FOUR per-input-phase convs instead
    of one dense conv over the embedded (ext, ext, 4cin, 4cout) kernel.

    The dense embedding is ~49% structural zeros for k=7 (ext=5 covers the
    tap-offset union of both row phases; each (input-phase, output-phase)
    pair only populates 3-4 of the 5 offsets per dim).  Restricting each
    conv to one input phase shrinks the kernel to its exact ceil(k/2)
    extent — 4x (4,4,cin,4cout) convs = 0.64x the dense MACs at identical
    output-lane utilization (cout stays 4x folded).  The splits sum into
    one output, so XLA fuses the adds; gradients flow through each
    embedding's gathers exactly as in the dense form.

    Measured on v5e (round 4, BENCH_NOTES): 62.99 samples/s vs 67.3
    dense — REJECTED as a default.  The 0.64x MACs lose to input-channel
    tiling: the dense embedding's 4*cin input depth fills sublane tiles
    the split's cin-deep convs leave 3/4 empty, and the embedded zeros
    ride in tiles the MXU streams anyway.  Kept opt-in with golden tests
    as the measured record.  FLOODGAN_P2P_SPLIT=1 enables."""
    return _env_bool("FLOODGAN_P2P_SPLIT", False)


def mxu_stats() -> str:
    """Where the instance-norm statistics reductions run: "" (default,
    VPU convert+reduce chains fused by XLA), "fwd" (the forward
    sum-of-squares rides the MXU as the diagonal of a Gram matmul
    x^T x with f32 accumulation — the round-4 profile's 5.2 ms
    convert_reduce fusion is per-channel stats over a (8, 256^2, 256)
    head tensor, ~381M VPU element-converts that a 69 GFLOP batched
    matmul replaces at ~0.35 ms of MXU time), or "all" (backward
    m2 = sum(g * yhat) reduces take the same route as diag(g^T yhat)).

    Numerics: bf16 operands accumulate in f32 on the MXU — the same
    values the VPU path converts and sums, reassociated; golden-tested
    against the VPU path at allclose tolerance (tests/test_fused_grads).

    Default OFF — measured-and-REJECTED on v5e (headline config, same
    session: control 67.13, fwd 63.82, all 56.46 samples/s).  The step
    is MXU-bound: the VPU convert+reduce chains ride in fusions that
    OVERLAP the convolutions, so they are free, while the Gram matmuls
    add real MXU cycles (69 GFLOP each for the 256-ch head stats) on
    the critical resource plus layout copies of their operands.  Same
    lesson as flat_compose: visible-in-the-profile VPU/DMA time is not
    necessarily stall time.  Kept opt-in as the measured record."""
    env = os.environ.get("FLOODGAN_MXU_STATS")
    if env is None:
        return ""
    v = env.lower()
    if v in _FALSY:
        return ""
    if v in ("fwd", "all"):
        return v
    if v in _TRUTHY:
        return "all"
    raise ValueError(
        f"FLOODGAN_MXU_STATS: unrecognized value {env!r}; expected "
        "0/off, fwd, all, or 1/on (= all)"
    )


def post_transform_cache() -> bool:
    """Whether BatchLoader caches POST-transform samples (the exact
    device-side transform outputs, fetched to host once) so epochs >= 2
    skip TIFF decode AND the transform, and ship the small feed tensors
    instead of raw stacks.

    The transform (flip -> slice -> resize -> crop -> normalise,
    data/transforms.py) is epoch-invariant per sample: flip/crop_index
    are per-sample-static dataset attributes and resize/normalise are
    deterministic, so the cache key is just the sample index.  At the
    headline config this cuts the wire from 50.3 MB/sample (raw 1024^2
    x12ch f32) to 12.6 MB (512^2 x(9+3) f32) and drops the decode-core
    requirement to ~0 after epoch 1 (measured budget table in
    BENCH_NOTES round 5).  Cached arrays are bit-identical to the
    transform path's outputs (device_get of the same jitted program);
    pinned by tests/test_data.py::test_post_transform_cache_*.
    FLOODGAN_POST_CACHE=0 disables; FLOODGAN_POST_CACHE_BYTES bounds
    the per-dataset host RAM (default 4 GiB)."""
    return _env_bool("FLOODGAN_POST_CACHE", True)


def custom_vjp_norms() -> bool:
    """Whether the norm/pad chains use the hand-derived closed-form VJPs
    (ops/fused_grads.py) instead of autodiff through the statistics
    formulas.  Forward numerics are identical; the backward is the same
    math with fewer passes over HBM.  FLOODGAN_CUSTOM_VJP=0 reverts."""
    return _env_bool("FLOODGAN_CUSTOM_VJP", True)


def norm_arith_bf16() -> bool:
    """Whether the normalisation normalize/activation chains run in the
    activation dtype under the bf16 policy (statistics are always f32).
    Measured ≥ the f32 chain on v5e (BENCH_NOTES round 2);
    FLOODGAN_NORM_BF16=0 forces the f32 chain."""
    return _env_bool("FLOODGAN_NORM_BF16", True)


def step_compiler_options() -> dict:
    """XLA compiler options for the jitted train steps, decided at trainer
    construction ({} on non-TPU backends — the options are TPU-compiler
    flags).

    Measured default (tools/xla_option_sweep.py, v5e 512² b8 headline):
    ``xla_tpu_scoped_vmem_limit_kib=57344`` — 67.32 samples/s vs 65.44
    same-session control (+2.9%; more scoped VMEM gives the conv fusions
    deeper buffers).  The sweep: 48M→67.19, 56M→67.32, 64M→66.52,
    72M→64.90, 96M→64.89 (too much crowds out prefetch buffers), and the
    latency-hiding scheduler was neutral — 56 MiB is the measured peak.
    These must travel as COMPILE OPTIONS, not XLA_FLAGS: the
    tunneled backend compiles server-side (env never propagates) and
    TPU-only flag names abort the local CPU-build flag parser.

    FLOODGAN_XLA_OPTIONS overrides: unset = measured default;
    0/off/none/false/"" = disable; else "name=value[,name=value...]"
    passed through verbatim."""
    raw = os.environ.get("FLOODGAN_XLA_OPTIONS")
    if raw is not None:
        if raw.strip().lower() in _FALSY + ("none",):
            return {}
        return dict(kv.split("=", 1) for kv in raw.split(",") if kv.strip())
    import jax

    try:
        kind = getattr(jax.devices()[0], "device_kind", "")
    except Exception:
        return {}
    if not kind.startswith("TPU"):
        return {}
    return {"xla_tpu_scoped_vmem_limit_kib": "57344"}
