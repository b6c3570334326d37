"""Small-model LibriTTS-R training driver.

Mirrors the reference example (reference: train_libritts_small.py): a 768-dim
16-layer DiT over a byte-level vocab, batched to ~40 s of audio, mel padded to
multiples of 256 frames. Scales across chips by passing a mesh to the trainer
(data-parallel batches + tensor-parallel attention/FF); add fsdp=True to
shard params + optimizer moments over the data axis (ZeRO) and
train(grad_accum=k) for k-microbatch accumulation inside the jitted step —
see docs/SCALING.md.
"""

import jax

from f5_tts_tpu.config import F5TTS_SMALL, CFMConfig, VocosConfig
from f5_tts_tpu.data import load_libritts_r, make_training_pipeline
from f5_tts_tpu.models.cfm import F5TTS
from f5_tts_tpu.models.vocos import Vocos
from f5_tts_tpu.training import F5TTSTrainer

vocab = {chr(i): i for i in range(256)}

try:
    vocos = Vocos.from_pretrained("lucasnewman/vocos-mel-24khz")
    vocoder = vocos.decode
except Exception as e:  # offline: train without sample-audio decoding
    print(f"vocoder unavailable ({e}); training continues without sample synthesis")
    vocoder = None

dit_cfg = F5TTS_SMALL.replace(text_num_embeds=len(vocab))
f5tts = F5TTS.init(
    jax.random.key(0),
    dit_cfg,
    cfm_cfg=CFMConfig(),
    vocab_char_map=vocab,
    vocoder=vocoder,
)

num_params = sum(p.size for p in jax.tree_util.tree_leaves(f5tts.params))
print(f"Using {num_params:,} trainable parameters.")

epochs = 100
max_duration = 10
max_batch_duration = 40
batch_size = int(max_batch_duration / max_duration)

samples, path = load_libritts_r(split="dev-clean", max_duration=max_duration)
batched_dataset = make_training_pipeline(
    samples,
    batch_size=batch_size,
    epochs=epochs,
    shuffle_buffer=500,
    num_threads=6,
    pad_frame_multiple=256,
    # raw-audio batches: the mel front-end runs inside the jitted train step
    # on the accelerator, keeping the host pipeline pure IO (decode-bound)
    on_device_mel=True,
)

trainer = F5TTSTrainer(
    model=f5tts,
    num_warmup_steps=1000,
    max_grad_norm=1,
    log_with_wandb=False,
)

trainer.train(
    train_dataset=batched_dataset,
    learning_rate=1e-4,
    total_steps=1_000_000,
    save_every=10_000,
    sample_every=100,
    sample_reference_audio="f5_tts_tpu/assets/test_en_1_ref_short.wav",
    sample_reference_text="Some call me nature, others call me mother nature.",
    sample_generation_duration=3.5,
    sample_generation_text="The quick brown fox jumped over the lazy dog.",
    on_device_mel=True,
)
