#!/usr/bin/env python3
"""I-FGSM attack CLI — TPU-native rebuild of the reference `attack_FGSM.py`.

Same flag surface (see `pcfa_tpu/cli/parsing.py`). Set PCFA_CPU=1 to force
the JAX CPU backend.
"""

import os

if os.environ.get("PCFA_CPU"):
    import jax

    jax.config.update("jax_platforms", "cpu")

from pcfa_tpu.cli.attack_fgsm import main

if __name__ == "__main__":
    main()
