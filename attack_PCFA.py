#!/usr/bin/env python3
"""PCFA attack CLI — TPU-native rebuild of the reference `attack_PCFA.py`.

Same flag surface (see `pcfa_tpu/cli/parsing.py`). Set PCFA_CPU=1 to force
the JAX CPU backend (useful for smoke runs without TPU access).
"""

import os

if os.environ.get("PCFA_CPU"):
    import jax

    jax.config.update("jax_platforms", "cpu")

from pcfa_tpu.cli.attack_pcfa import main

if __name__ == "__main__":
    main()
