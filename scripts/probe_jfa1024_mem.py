#!/usr/bin/env python
"""Compile-only HBM accounting for the packed donated JFA steps @1024.

The round-5 battery's `BENCH_OP=jfa BENCH_N=1024` item RESOURCE_EXHAUSTed
at runtime even on the packed one-int32 seed with donate_argnums (the
expectation was peak ~2 grids + fused temps). This probe compiles the
init / one k=512 step / one k=1 step / final of `jfa_xla_stepped`'s
packed path at 1024^3 and prints XLA's memory analysis per program
(temp/argument/output/peak bytes) without executing, so the oversized
buffers can be identified from the buffer assignment instead of guessed.

Env: MEM_N (default 1024), MEM_TOP (default 8 largest buffers).
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("MEM_CPU"):  # script-validation runs off-tunnel
    jax.config.update("jax_platforms", "cpu")

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import jax.numpy as jnp
import numpy as np


def report(label, lowered):
    compiled = lowered.compile()
    m = compiled.memory_analysis()
    gib = 1024 ** 3
    print(f"{label}: temp={m.temp_size_in_bytes / gib:.2f}G "
          f"args={m.argument_size_in_bytes / gib:.2f}G "
          f"out={m.output_size_in_bytes / gib:.2f}G "
          f"alias={m.alias_size_in_bytes / gib:.2f}G "
          f"peak~{(m.temp_size_in_bytes + m.argument_size_in_bytes + m.output_size_in_bytes - m.alias_size_in_bytes) / gib:.2f}G",
          flush=True)
    return compiled


def main():
    n = int(os.environ.get("MEM_N", "1024"))

    from voxtpu.ops import jfa as J

    occ = jax.ShapeDtypeStruct((n, n, n), jnp.bool_)
    seed = jax.ShapeDtypeStruct((n, n, n), jnp.int32)
    origin = jax.ShapeDtypeStruct((3,), jnp.float32)
    vs = jax.ShapeDtypeStruct((), jnp.float32)

    report("init", J._init_packed_jit.lower(occ, n=n))
    for k in (n // 2, 16, 1):
        report(f"step k={k}",
               J._step_packed_jit.lower(seed, origin, vs, k=k, n=n))
    report("final", J._final_packed_jit.lower(seed, occ, origin, vs, n=n))


if __name__ == "__main__":
    main()
