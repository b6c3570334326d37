from f5_tts_tpu.audio.mel import MelSpec, log_mel_spectrogram, mel_filters, stft, hanning
from f5_tts_tpu.audio.resample import resample

__all__ = ["MelSpec", "log_mel_spectrogram", "mel_filters", "stft", "hanning", "resample"]
