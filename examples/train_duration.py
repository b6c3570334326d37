"""Duration-predictor training driver on LibriTTS-R.

Counterpart of the reference's duration_trainer usage: same data pipeline as
the CFM example, L1 regression of clip duration in seconds from a random
prefix (reference: duration_trainer.py, duration.py:232-260)."""

import jax

from f5_tts_tpu.config import DurationConfig
from f5_tts_tpu.data import load_libritts_r, make_training_pipeline
from f5_tts_tpu.models.duration import DurationPredictor
from f5_tts_tpu.training import DurationTrainer

vocab = {chr(i): i for i in range(256)}

cfg = DurationConfig(
    dim=512,
    depth=8,
    heads=8,
    text_dim=512,
    ff_mult=2,
    conv_layers=2,
    text_num_embeds=len(vocab),
)
model = DurationPredictor.init(jax.random.key(0), cfg, vocab_char_map=vocab)

num_params = sum(p.size for p in jax.tree_util.tree_leaves(model.params))
print(f"Using {num_params:,} trainable parameters.")

samples, _ = load_libritts_r(split="dev-clean", max_duration=30)
pipeline = make_training_pipeline(samples, batch_size=16, epochs=100, shuffle_buffer=500)

trainer = DurationTrainer(model, num_warmup_steps=1000, max_grad_norm=1.0)
trainer.train(
    pipeline,
    learning_rate=1e-4,
    total_steps=100_000,
    save_every=10_000,
)
