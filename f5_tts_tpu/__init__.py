"""f5-tts-tpu: TPU-native F5-TTS built on JAX/XLA/Pallas.

A from-scratch re-design of the capabilities of ``lucasnewman/f5-tts-mlx``
(reference: /root/reference) for TPU hardware: functional parameter pytrees,
``lax.scan`` ODE integration with batched classifier-free guidance, mesh-based
data/tensor parallelism, and Pallas kernels for the hot ops.
"""

from f5_tts_tpu.models.cfm import F5TTS

__all__ = ["F5TTS"]
