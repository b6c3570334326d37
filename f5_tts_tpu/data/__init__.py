from f5_tts_tpu.data.loader import Stream, make_training_pipeline
from f5_tts_tpu.data.libritts import load_libritts_r, load_libritts_r_tarfile, load_dir

__all__ = [
    "Stream",
    "make_training_pipeline",
    "load_libritts_r",
    "load_libritts_r_tarfile",
    "load_dir",
]
