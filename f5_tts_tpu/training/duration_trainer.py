"""Duration predictor trainer (reference: duration_trainer.py:36-171).

Same optimizer/schedule/jit skeleton as the CFM trainer; the loss path is the
duration model's random-prefix L1 regression. Also fixes the reference's
broken resume path (the '.saftensors' typo at duration_trainer.py:58)."""

from __future__ import annotations

import datetime
import os
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import optax

from f5_tts_tpu.models.convert import convert_duration_state, export_duration_state
from f5_tts_tpu.models.duration import DurationPredictor, duration_forward
from f5_tts_tpu.training.trainer import init_train_state, make_optimizer


def make_duration_train_step(cfg, optimizer: optax.GradientTransformation, frames_per_second: float):
    def train_step(state, mel, text, lens, key):
        def loss_fn(p):
            return duration_forward(
                p, cfg, mel, text, lens, key=key, return_loss=True,
                frames_per_second=frames_per_second,
            )

        loss, grads = jax.value_and_grad(loss_fn)(state["params"])
        updates, opt_state = optimizer.update(grads, state["opt_state"], state["params"])
        params = optax.apply_updates(state["params"], updates)
        return {"params": params, "opt_state": opt_state, "step": state["step"] + 1}, loss

    return train_step


class DurationTrainer:
    def __init__(
        self,
        model: DurationPredictor,
        num_warmup_steps: int = 1000,
        max_grad_norm: float = 1.0,
        log_with_wandb: bool = False,
        results_dir: str = "results",
    ):
        self.model = model
        self.num_warmup_steps = num_warmup_steps
        self.max_grad_norm = max_grad_norm
        self.log_with_wandb = log_with_wandb
        self.results_dir = Path(results_dir)
        self.state: dict | None = None

    def save_checkpoint(self, step: int) -> None:
        os.makedirs(self.results_dir, exist_ok=True)
        from safetensors.numpy import save_file

        params = self.state["params"] if self.state else self.model.params
        flat = {k: np.ascontiguousarray(np.asarray(v))
                for k, v in export_duration_state(params).items()}
        # reference-loadable: the MLX model's strict load needs its rotary param
        from f5_tts_tpu.models.convert import rotary_inv_freq

        flat["transformer.rotary_embed.inv_freq"] = rotary_inv_freq(self.model.cfg.dim_head)
        save_file(flat, self.results_dir / f"duration_{step}.safetensors")

    def load_checkpoint(self, step: int) -> None:
        from safetensors.numpy import load_file

        flat = load_file(self.results_dir / f"duration_{step}.safetensors")
        self.model.params = convert_duration_state(flat, self.model.cfg)
        if self.state is not None:
            self.state["params"] = self.model.params

    def train(
        self,
        train_dataset,
        learning_rate: float = 1e-4,
        weight_decay: float = 1e-2,
        total_steps: int = 100_000,
        save_every: int = 10_000,
        checkpoint: int | None = None,
        log_every: int = 10,
        seed: int = 0,
    ) -> None:
        """`train_dataset` yields dicts with "mel_spec", "mel_len",
        "transcript" (same batch schema as the CFM trainer)."""
        if self.log_with_wandb:
            import wandb

            wandb.init(project="f5tts-duration",
                       config=dict(learning_rate=learning_rate, total_steps=total_steps))

        optimizer = make_optimizer(
            learning_rate, weight_decay, self.num_warmup_steps, total_steps, self.max_grad_norm
        )
        self.state = init_train_state(self.model.params, optimizer)

        start_step = 0
        if checkpoint is not None:
            self.load_checkpoint(checkpoint)
            start_step = checkpoint

        fps = self.model.audio_cfg.sample_rate / self.model.audio_cfg.hop_length
        step_fn = make_duration_train_step(self.model.cfg, optimizer, fps)
        train_step = jax.jit(step_fn, donate_argnums=(0,))

        root_key = jax.random.key(seed)
        global_step = start_step
        start_date = datetime.datetime.now()

        from tqdm import tqdm

        pbar = tqdm(initial=start_step, total=total_steps, unit="step")

        for batch in train_dataset:
            mel_spec = jnp.asarray(batch["mel_spec"])
            if mel_spec.ndim == 4:
                mel_spec = mel_spec[:, 0]
            mel_lens = jnp.asarray(batch["mel_len"], dtype=jnp.int32).reshape(-1)
            text = np.asarray(batch["transcript"])
            if text.ndim == 3:
                text = text[:, :, 0] if text.shape[-1] == 1 else text[:, 0]
            text = jnp.asarray(text, dtype=jnp.int32)

            key = jax.random.fold_in(root_key, global_step)
            self.state, loss = train_step(self.state, mel_spec, text, mel_lens, key)

            global_step += 1
            if global_step % log_every == 0 or global_step == start_step + 1:
                loss_val = float(loss)
                if self.log_with_wandb:
                    import wandb

                    wandb.log({"loss": loss_val}, step=global_step)
                pbar.set_postfix({"loss": f"{loss_val:.4f}"})
            pbar.update(1)

            if global_step % save_every == 0:
                self.model.params = self.state["params"]
                self.save_checkpoint(global_step)
            if global_step >= total_steps:
                break

        pbar.close()
        self.model.params = self.state["params"]
        if self.log_with_wandb:
            import wandb

            wandb.finish()
        print(f"Training complete in {datetime.datetime.now() - start_date}")
