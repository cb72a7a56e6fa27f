#!/usr/bin/env python
"""Repro: axon TPU backend mis-executes a SECOND in-process program holding
``ops/select.topk_strided`` graphs.

This is the load-bearing justification for ``ops/select.py`` being
oracle-exact + unit-tested but NOT wired into production (its docstring
STATUS note, PROFILE_r04 §2, NEXT.md #4).  The original bisect scripts
lived in ``/tmp/repro_seq*.py`` (2026-08-20) and were lost with the round-4
session; this is a faithful reconstruction of the minimized sequence,
checked back into the tree per round-4 VERDICT Weak #7a.

Observed failure mode (reproduced 5x in round 4, including the real
800×1216 FPN detect graph):

  * program A (jitted, contains topk_strided at one shape): runs clean.
  * program B (jitted, a DIFFERENT but similar graph also containing
    topk_strided): fails at RUN time with
    ``INVALID_ARGUMENT: TPU backend error`` — but runs clean when it is
    the only program in the process.
  * the identical A-then-B sequence with ``jax.lax.top_k`` substituted for
    ``topk_strided`` (--control) runs clean, isolating the strided
    multi-TopK decomposition (XLA TopK over a (..., G, S) view followed by
    a re-rank TopK) as the trigger.

Usage:
    python scripts/repro_axon/repro_strided_topk.py            # strided arm
    python scripts/repro_axon/repro_strided_topk.py --control  # lax.top_k arm
    python scripts/repro_axon/repro_strided_topk.py --only a|b # each alone: clean

Exit status 0 = both programs executed and matched the numpy oracle (i.e.
the backend bug is FIXED — re-wire ops/select.py per its STATUS note);
nonzero = the documented failure reproduced (or a value mismatch).
"""

import argparse
import os.path as osp
import sys

sys.path.insert(0, osp.join(osp.dirname(__file__), "..", ".."))

import jax
import jax.numpy as jnp
import numpy as np

from frcnn_tpu.ops.select import topk_strided


def np_topk(x, k):
    order = np.argsort(-x, axis=-1, kind="stable")[..., :k]
    return np.take_along_axis(x, order, axis=-1)


def run_program(name, shape, k, use_strided, rng):
    """One jitted program: select + a little surrounding arithmetic (the
    production graphs wrap the select in decode/clip work; a bare top_k
    did not always trigger)."""
    x = rng.rand(*shape).astype(np.float32)

    @jax.jit
    def f(a):
        if use_strided:
            v, i = topk_strided(a, k)
        else:
            v, i = jax.lax.top_k(a, k)
        # the production graphs wrap the select in decode/clip arithmetic;
        # keep a little of that shape here
        return jnp.sort(v * 0.5 + 1.0, axis=-1), i

    try:
        v, _i = f(jnp.asarray(x))
        v = np.asarray(v)
    except Exception as e:  # noqa: BLE001 — the repro IS the exception
        print(f"  program {name}: FAILED AT RUN TIME: {type(e).__name__}: "
              f"{str(e)[:200]}")
        return False
    # value check (the failure has also shown as silent wrong values on
    # repeat executions, not only as INVALID_ARGUMENT): compare the selected
    # VALUE set (sorted) to the numpy oracle — tie order doesn't matter
    want = np.sort(np_topk(x, k) * 0.5 + 1.0, axis=-1)
    ok = np.allclose(v, want, atol=1e-6)
    print(f"  program {name}: ran; values {'OK' if ok else 'MISMATCH'}")
    return ok


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--control", action="store_true",
                    help="use lax.top_k instead of topk_strided (runs clean)")
    ap.add_argument("--only", choices=["a", "b"],
                    help="run just one program (each alone runs clean)")
    args = ap.parse_args()
    use_strided = not args.control

    print(f"backend={jax.default_backend()}  "
          f"arm={'strided' if use_strided else 'control(lax.top_k)'}")
    rng = np.random.RandomState(0)
    ok = True
    # A and B: similar-but-different shapes, mirroring the round-4 bisect
    # (train-L2-like then detect-P2-like propose selects).
    if args.only in (None, "a"):
        ok &= run_program("A (8,116736) k=2000", (8, 116736), 2000,
                          use_strided, rng)
    if args.only in (None, "b"):
        ok &= run_program("B (8,182400) k=1000", (8, 182400), 1000,
                          use_strided, rng)
    print("CLEAN — backend bug not reproduced" if ok
          else "REPRODUCED — second strided program failed (see above)")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
