"""Command-line entry points: attack_pcfa, attack_fgsm, evaluate_pcfa."""
