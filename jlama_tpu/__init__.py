"""jlama-tpu: a TPU-native quantized LLM inference engine.

A from-scratch JAX/XLA/Pallas implementation with the capabilities of
tjake/Jlama (see SURVEY.md for the capability contract).
"""

__version__ = "0.1.0"
