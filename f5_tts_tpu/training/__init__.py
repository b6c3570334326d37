from f5_tts_tpu.training.trainer import F5TTSTrainer, make_optimizer, make_train_step
from f5_tts_tpu.training.duration_trainer import DurationTrainer

__all__ = ["F5TTSTrainer", "DurationTrainer", "make_optimizer", "make_train_step"]
