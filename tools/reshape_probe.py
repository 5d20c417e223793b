#!/usr/bin/env python3
"""Mosaic feasibility probe: sublane<->lane fold reshapes inside a Pallas
TPU kernel.

The stacked-region batched mega-kernel design (round-4 attempt at the
stream-major rebuild, VERDICT r3 #4) reduces every boundary conv to tap
matmuls IF these two value-space reshapes lower:

- fold:   (R, C)   -> (R/s, s*C)   (s consecutive rows side by side)
- unfold: (R, s*C) -> (R*s, C)     (inverse)

This probes both on the real chip at the shapes the kernel would use and
checks numerics against numpy. Exit 0 = both lower and match.
"""

import sys

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def probe(shape, s, mode):
    r, c = shape

    def kernel(x_ref, y_ref):
        v = x_ref[...]
        if mode == "fold":
            y_ref[...] = v.reshape(r // s, s * c)
        else:
            y_ref[...] = v.reshape(r * s, c // s)

    out_shape = (r // s, s * c) if mode == "fold" else (r * s, c // s)
    x = np.arange(r * c, dtype=np.float32).reshape(r, c)
    y = pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(out_shape, jnp.float32),
    )(jnp.asarray(x))
    want = x.reshape(out_shape)
    got = np.asarray(y)
    ok = np.array_equal(got, want)
    print(f"{mode} {shape} s={s}: {'OK' if ok else 'MISMATCH'}")
    return ok


def main():
    ok = True
    # the shapes the stacked-region kernel needs: enc level-1..3 folds
    # (stride 4, 5, 5 on 64/128/256 lanes) and dec unfolds (inverse)
    for shape, s in [((416, 64), 4), ((112, 128), 5), ((32, 256), 5)]:
        try:
            ok &= probe(shape, s, "fold")
        except Exception as e:
            print(f"fold {shape} s={s}: FAILED {type(e).__name__}: {e}"[:300])
            ok = False
    for shape, s in [((104, 4 * 64), 4), ((24, 5 * 128), 5),
                     ((8, 5 * 256), 5)]:
        try:
            ok &= probe(shape, s, "unfold")
        except Exception as e:
            print(f"unfold {shape} s={s}: FAILED {type(e).__name__}: {e}"[:300])
            ok = False
    print("RESULT:", "supported" if ok else "unsupported")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
