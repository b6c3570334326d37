"""Duration predictor trainer (reference: duration_trainer.py:36-171).

Same optimizer/schedule/jit skeleton as the CFM trainer, brought to full
feature parity with it: optional device-mesh sharding, optional EMA, full
train-state checkpoints (orbax async or safetensors), and crash resume via
checkpoint="latest". The reference's own resume path is broken (the
'.saftensors' typo at duration_trainer.py:58) and weights-only (restarting
the LR schedule); both are fixed here.
"""

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
from f5_tts_tpu.training.trainer import (
    _build_step,
    init_train_state,
    make_optimizer,
    split_microbatches,
)


def make_duration_train_step(
    cfg,
    optimizer: optax.GradientTransformation,
    frames_per_second: float,
    ema_decay: float | None = None,
    grad_accum: int = 1,
):
    """Same step mechanics as the CFM trainer (trainer._build_step): one
    value_and_grad -> clip/AdamW -> optional EMA, or with grad_accum=k > 1 a
    lax.scan over k microbatches ([k, b, ...] inputs, f32 gradient carry,
    single update)."""

    def loss_fn(p, mel, text, lens, key):
        return duration_forward(
            p, cfg, mel, text, lens, key=key, return_loss=True,
            frames_per_second=frames_per_second,
        )

    return _build_step(loss_fn, optimizer, ema_decay, grad_accum)


class DurationTrainer:
    def __init__(
        self,
        model: DurationPredictor,
        num_warmup_steps: int = 1000,
        max_grad_norm: float = 1.0,
        log_with_wandb: bool = False,
        results_dir: str = "results",
        mesh=None,
        ema_decay: float | None = None,
        use_orbax: bool = False,
        fsdp: bool = False,
    ):
        self.model = model
        self.num_warmup_steps = num_warmup_steps
        self.max_grad_norm = max_grad_norm
        self.log_with_wandb = log_with_wandb
        self.results_dir = Path(results_dir)
        self.mesh = mesh
        self.ema_decay = ema_decay
        self.use_orbax = use_orbax
        # ZeRO/FSDP placement, as in F5TTSTrainer (no effect without a mesh)
        self.fsdp = fsdp
        self.ckpt_mgr = None
        self.state: dict | None = None

    # ------------------------------------------------------------ checkpoint

    def save_checkpoint(self, step: int) -> None:
        """Weights in the reference-loadable duration_v2 convention + full
        train state (orbax async when enabled, safetensors otherwise)."""
        os.makedirs(self.results_dir, exist_ok=True)
        from safetensors.numpy import save_file

        from f5_tts_tpu.models.convert import rotary_inv_freq

        def _export(params, path):
            flat = {k: np.ascontiguousarray(np.asarray(v))
                    for k, v in export_duration_state(params).items()}
            # reference-loadable: the MLX model's strict load needs its rotary param
            flat["transformer.rotary_embed.inv_freq"] = rotary_inv_freq(self.model.cfg.dim_head)
            save_file(flat, path)

        params = self.state["params"] if self.state else self.model.params
        _export(params, self.results_dir / f"duration_{step}.safetensors")
        if self.state is not None and "ema" in self.state:
            _export(self.state["ema"], self.results_dir / f"duration_{step}.ema.safetensors")

        if self.state is not None:
            from f5_tts_tpu.training.checkpoints import save_train_state

            save_train_state(
                self.ckpt_mgr, step, self.state,
                self.results_dir / f"duration_{step}.trainstate.safetensors",
            )

    def load_checkpoint(self, step: int) -> None:
        from safetensors.numpy import load_file

        flat = load_file(self.results_dir / f"duration_{step}.safetensors")
        self.model.params = convert_duration_state(flat, self.model.cfg)
        if self.state is not None:
            self.state["params"] = self.model.params
            ema_path = self.results_dir / f"duration_{step}.ema.safetensors"
            if "ema" in self.state and ema_path.exists():
                self.state["ema"] = convert_duration_state(load_file(ema_path), self.model.cfg)
            from f5_tts_tpu.training.checkpoints import restore_train_state_file

            restore_train_state_file(
                self.state,
                self.results_dir / f"duration_{step}.trainstate.safetensors",
                "the reference's resume bug, duration_trainer.py:55-60",
            )

    def _latest_checkpoint_step(self) -> int | None:
        from f5_tts_tpu.training.checkpoints import latest_checkpoint_step

        return latest_checkpoint_step(self.results_dir, "duration_", self.ckpt_mgr)

    def _restore_orbax(self, step: int) -> dict:
        from f5_tts_tpu.training.checkpoints import restore_orbax_adapting_ema

        return restore_orbax_adapting_ema(self.ckpt_mgr, step, self.state)

    # ------------------------------------------------------------ training

    def train(
        self,
        train_dataset,
        learning_rate: float = 1e-4,
        weight_decay: float = 1e-2,
        total_steps: int = 100_000,
        save_every: int = 10_000,
        checkpoint: int | str | None = None,  # step number or "latest"
        log_every: int = 10,
        seed: int = 0,
        grad_accum: int = 1,
    ) -> None:
        """`train_dataset` yields dicts with "mel_spec", "mel_len",
        "transcript" (same batch schema as the CFM trainer). `grad_accum=k`
        splits each yielded batch into k microbatches accumulated inside one
        jitted step (see F5TTSTrainer.train); batch size must divide by k."""
        if self.log_with_wandb:
            import wandb

            wandb.init(project="f5tts-duration",
                       config=dict(learning_rate=learning_rate, total_steps=total_steps))

        optimizer = make_optimizer(
            learning_rate, weight_decay, self.num_warmup_steps, total_steps, self.max_grad_norm
        )
        self.state = init_train_state(self.model.params, optimizer, ema=self.ema_decay is not None)

        if self.use_orbax:
            from f5_tts_tpu.training.checkpoints import TrainCheckpointManager

            self.ckpt_mgr = TrainCheckpointManager(self.results_dir / "orbax")

        if checkpoint == "latest":
            checkpoint = self._latest_checkpoint_step()
            if checkpoint is None:
                print("No checkpoint found; starting fresh")

        start_step = 0
        if checkpoint is not None:
            if self.ckpt_mgr is not None and checkpoint in self.ckpt_mgr.all_steps():
                self.state = self._restore_orbax(checkpoint)
                self.model.params = self.state["params"]
            else:
                if self.ckpt_mgr is not None:
                    print(
                        f"warning: step {checkpoint} not in orbax; resuming "
                        "from the safetensors files"
                    )
                self.load_checkpoint(checkpoint)
            start_step = checkpoint
            print(f"Starting training at step {start_step}")

        if grad_accum < 1:
            raise ValueError(f"grad_accum must be >= 1, got {grad_accum}")
        fps = self.model.audio_cfg.sample_rate / self.model.audio_cfg.hop_length
        step_fn = make_duration_train_step(
            self.model.cfg, optimizer, fps, ema_decay=self.ema_decay,
            grad_accum=grad_accum,
        )
        if self.mesh is not None:
            from f5_tts_tpu.parallel.mesh import shard_state, shard_train_step

            train_step = shard_train_step(
                step_fn, self.mesh, self.state, grad_accum=grad_accum,
                fsdp=self.fsdp,
            )
            self.state = shard_state(self.state, self.mesh, fsdp=self.fsdp)
        else:
            train_step = jax.jit(step_fn, donate_argnums=(0,))

        root_key = jax.random.key(seed)
        global_step = start_step
        start_date = datetime.datetime.now()

        from tqdm import tqdm

        pbar = tqdm(initial=start_step, total=total_steps, unit="step")

        try:
            for batch in train_dataset:
                mel_spec = jnp.asarray(batch["mel_spec"])
                if mel_spec.ndim == 4:
                    mel_spec = mel_spec[:, 0]
                mel_lens = jnp.asarray(batch["mel_len"], dtype=jnp.int32).reshape(-1)
                text = np.asarray(batch["transcript"])
                if text.ndim == 3:
                    text = text[:, :, 0] if text.shape[-1] == 1 else text[:, 0]
                text = jnp.asarray(text, dtype=jnp.int32)

                mel_spec, text, mel_lens = split_microbatches(
                    grad_accum, mel_spec, text, mel_lens,
                    data_size=(self.mesh.shape.get("data")
                               if self.mesh is not None else None),
                )

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
        finally:
            pbar.close()
            self.model.params = self.state["params"]
            if self.ckpt_mgr is not None:
                # flush pending async writes even on an exception mid-loop
                self.ckpt_mgr.wait()
            if self.log_with_wandb:
                import wandb

                wandb.finish()

        print(f"Training complete in {datetime.datetime.now() - start_date}")
