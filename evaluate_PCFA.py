#!/usr/bin/env python3
"""PCFA evaluation CLI — TPU-native rebuild of the reference
`evaluate_PCFA.py`. Same flag surface. Set PCFA_CPU=1 to force the JAX CPU
backend."""

import os

if os.environ.get("PCFA_CPU"):
    import jax

    jax.config.update("jax_platforms", "cpu")

from pcfa_tpu.cli.evaluate_pcfa import main

if __name__ == "__main__":
    main()
