#!/usr/bin/env python
"""Benchmark: end-to-end detection throughput on one TPU chip.

North-star config (BASELINE.json): ResNet-50 C4, 800px, full fused pipeline
(in-graph preprocessing → backbone → RPN → proposal NMS (Pallas) → RoIAlign
(Pallas) → box head → per-class NMS → top-k), batch 8, bfloat16 trunk.

Baseline: the reference's CPU throughput at the same config, measured with
scripts/torch_cpu_baseline.py on this machine = 0.1538 images/sec
(6.5 s/image; see BASELINE.md).  The north-star asks for >= 10x that.

Timing methodology (important on the axon-tunneled TPU):
jax.block_until_ready does NOT reliably wait on this experimental backend,
and each dispatch pays ~25 ms of RPC overhead.  So the iteration loop runs
IN-GRAPH (lax.fori_loop with a data dependency between iterations), the
chain ends in one tiny host readback, and the per-iteration cost is the
SLOPE between two loop lengths — pure device throughput, no dispatch
overhead, no async mirage.

Prints ONE json line: {"metric", "value", "unit", "vs_baseline", ...}.

Session-scale invariance (round-4 VERDICT Weak #3): the raw img/s moves
±4-5% between tunnel sessions for reasons outside the program (memory/
dispatch-phase scale the pure-MXU calibration anchor cannot see).  So this
script also times a FROZEN in-repo copy of the detect program
(bench_pin.bin, generated once by scripts/make_bench_pin.py) interleaved
with HEAD in the same process, and emits head_over_pinned_ratio —
round-over-round comparisons should read the RATIO (±~1%), not the raw
value.
"""

import dataclasses
import json
import time

TORCH_CPU_BASELINE_IPS = 0.1538  # measured 2026-08-16, scripts/torch_cpu_baseline.py


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from frcnn_tpu.config import default_config
    from frcnn_tpu.models import build_model

    cfg = default_config()
    cfg = dataclasses.replace(
        cfg,
        TEST=dataclasses.replace(cfg.TEST, SCALES=(800,), MAX_SIZE=1333),
        TPU=dataclasses.replace(cfg.TPU, BUCKETS=((800, 1216),)),
    )
    on_tpu = jax.default_backend() == "tpu"
    dtype = jnp.bfloat16 if on_tpu else jnp.float32
    batch = 8 if on_tpu else 1

    from frcnn_tpu.models.backbones import pack_images

    model = build_model("res50", 21, cfg, dtype=dtype)
    h, w = cfg.TPU.BUCKETS[0]
    rng = np.random.RandomState(0)
    # host-packed (B, H, W/4, 12) layout: a free numpy view that spares the
    # device the ~4 ms relayout of the lane-hostile (…, 3) image tensor
    images = jnp.asarray(pack_images(
        rng.uniform(0, 255, (batch, h, w, 3)).astype(np.float32),
        getattr(model, "input_block", 1)))
    im_info = jnp.tile(jnp.asarray([[h, w, 1.0]], jnp.float32), (batch, 1))
    variables = model.init(jax.random.PRNGKey(0), images[:1], im_info[:1])

    @jax.jit
    def detect_loop(v, im0, ii, n):
        def body(i, carry):
            im, acc = carry
            det, _valid = model.apply(v, im, ii, method="detect")
            # serialize iterations THROUGH THE IMAGES: a dependency on only
            # im_info lets XLA hoist the loop-invariant backbone out of the
            # loop (observed: 'throughput' excluding the backbone entirely)
            s = jnp.sum(det[:, 0, 0])
            return im + s * 0.0, acc + s
        return jax.lax.fori_loop(0, n, body, (im0, 0.0))

    # warmup / compile, synced by readback
    out = detect_loop(variables, images, im_info, 2)
    _ = np.asarray(out[1])

    n_lo, n_hi = (4, 12) if on_tpu else (1, 2)

    def one_slope(run):
        """run(n) must execute the loop and sync via a scalar readback."""
        times = {}
        for n in (n_lo, n_hi):
            t0 = time.perf_counter()
            run(n)
            times[n] = time.perf_counter() - t0
        return (times[n_hi] - times[n_lo]) / (n_hi - n_lo)

    def run_head(n):
        out = detect_loop(variables, images, im_info, n)
        _ = np.asarray(out[1])  # forces completion

    # Pinned-reference arm (VERDICT r4 Weak #3): a FROZEN serialized copy of
    # the detect program (bench_pin.bin, see scripts/make_bench_pin.py) is
    # timed interleaved with HEAD in this same process.  The HEAD/pinned
    # ratio cancels session scale by construction — round-over-round
    # comparisons should read the ratio, not the raw img/s.
    run_pin = None
    pin_note = "bench_pin.bin absent"
    if on_tpu:
        import os.path as osp
        pin_path = osp.join(osp.dirname(osp.abspath(__file__)),
                            "bench_pin.bin")
        if osp.exists(pin_path):
            try:
                from jax import export as jexport
                with open(pin_path, "rb") as f:
                    exp = jexport.deserialize(bytearray(f.read()))
                # flat-args export: (*param_leaves, images, im_info, n).
                # Feed the pin HEAD's OWN leaves + images so both arms see
                # identical data — detect timing is data-DEPENDENT through
                # memory locality (degenerate synthetic weights collapse
                # every proposal to the same box, making the pool's gathers
                # perfectly local: measured −5% vs real init on an
                # otherwise byte-identical program).  Synthesize from avals
                # only if HEAD's param structure no longer matches the pin
                # (ratio then carries a data caveat in pinned_note).
                head_flat = jax.tree.leaves(variables) + [images, im_info]
                want = [(tuple(av.shape), str(av.dtype))
                        for av in exp.in_avals[:-1]]
                have = [(tuple(x.shape), str(x.dtype)) for x in head_flat]
                if want == have:
                    pin_args = head_flat
                    pin_note_data = "head data"
                else:
                    prng = np.random.RandomState(0)
                    pin_args = [
                        jnp.asarray(prng.uniform(0.01, 0.3, av.shape)
                                    .astype(av.dtype))
                        for av in exp.in_avals[:-1]]
                    pin_note_data = ("synthesized data (param structure "
                                    "changed since pin) — ratio carries a "
                                    "data-locality caveat")
                pin_call = jax.jit(exp.call)

                def run_pin(n):  # noqa: F811
                    out = pin_call(*pin_args, jnp.int32(n))
                    _ = float(out)

                run_pin(2)  # warmup/compile
                pin_note = f"ok ({pin_note_data})"
            except Exception as e:  # noqa: BLE001 — degrade to no-pin
                run_pin = None
                pin_note = f"pin load failed: {type(e).__name__}: {e}"[:200]

    # best-of-3 slopes: a single tunnel RPC stall inflates one endpoint and
    # once produced a 25%-slow outlier (docs/PROFILE_r02.md §1); the minimum
    # of independent slopes is still a pure device-time measurement.  Three
    # (was two through round 3) so the headline is round-over-round
    # comparable within the tunnel's ±3-4% cross-process band (VERDICT r3
    # Weak #1).  The pinned arm is interleaved head/pin/head/pin… so both
    # arms sample the same session conditions.
    slopes, pin_slopes = [], []
    for _ in range(3 if on_tpu else 1):
        slopes.append(one_slope(run_head))
        if run_pin is not None:
            pin_slopes.append(one_slope(run_pin))
    dt = min(slopes)
    ips = batch / dt
    detect_spread = (max(slopes) - min(slopes)) / min(slopes)
    pinned_ips = (batch / min(pin_slopes)) if pin_slopes else None
    ratio = (ips / pinned_ips) if pinned_ips else None

    # Calibration anchor: a chained bf16 matmul timed with the SAME slope
    # methodology.  The v5e peak is ~197 TFLOP/s bf16; a healthy anchor is
    # ~170+.  If this number is ever far off, the slope timing itself is
    # suspect and the img/s headline inherits the doubt — which is why it is
    # recorded next to it (VERDICT r2 Weak #6).
    k = 8192 if on_tpu else 512
    chain = 4  # matmuls per loop iteration: one 8192^3 matmul is only
    # ~6.4 ms on chip, so an 8-iteration slope spans ~51 ms — inside the
    # tunnel's ~25 ms RPC jitter (a single-slope version once printed a
    # NEGATIVE anchor).  4 chained matmuls x a 16-iteration span ~= 400 ms
    # of differential device time, and we keep the best of 3 positive slopes
    # (same outlier defense as the headline metric above).

    @jax.jit
    def mm_loop(a, n):
        def body(i, x):
            for _ in range(chain):
                x = jnp.tanh(x @ x) * 0.5
            return x
        # return a SCALAR: np.asarray on the full (k, k) output drags 128 MB
        # through the ~75 MB/s tunnel per timing call, and that transfer's
        # jitter (hundreds of ms) swamps the ~400 ms slope signal — observed
        # as a -4.3 TFLOP/s anchor in one run and an impossible 394 in
        # another.  The detect loop above reads back out[1], also a scalar.
        out = jax.lax.fori_loop(0, n, body, a)
        return jnp.float32(out[0, 0])

    a = jnp.asarray(rng.uniform(-0.1, 0.1, (k, k)), jnp.bfloat16)
    _ = float(mm_loop(a, 2))
    mm_lo, mm_hi = (8, 24) if on_tpu else (1, 2)
    mm_slopes = []
    for _ in range(3 if on_tpu else 1):
        mm_times = {}
        for n in (mm_lo, mm_hi):
            t0 = time.perf_counter()
            _ = float(mm_loop(a, n))
            mm_times[n] = time.perf_counter() - t0
        mm_slopes.append((mm_times[mm_hi] - mm_times[mm_lo]) / (mm_hi - mm_lo))
    good = [s for s in mm_slopes if s > 0]
    # No positive slope → the anchor is unmeasurable this run; emit null
    # (NaN is not valid JSON) and let the discarded-slope count flag it.
    tflops = (round(chain * 2 * k**3 / min(good) / 1e12, 1) if good
              else None)

    print(json.dumps({
        "metric": "images_per_sec_per_chip (ResNet-50 C4, 800x1216, batch "
                  f"{batch}, end-to-end fused detect, in-graph slope timing)",
        "value": round(ips, 2),
        "unit": "images/sec",
        "vs_baseline": round(ips / TORCH_CPU_BASELINE_IPS, 2),
        "detect_slopes_used": len(slopes),
        "detect_slope_spread_rel": round(detect_spread, 4),
        "pinned_ips": round(pinned_ips, 2) if pinned_ips else None,
        "head_over_pinned_ratio": round(ratio, 4) if ratio else None,
        "pinned_note": pin_note if on_tpu else "cpu run (no pin arm)",
        "calibration_matmul_tflops": tflops,
        "calibration_slopes_used": len(good),
        "calibration_note": f"chained {k}^3 bf16 matmul via the same slope "
                            "timing; v5e peak ~197 — validates methodology",
    }))


if __name__ == "__main__":
    main()
