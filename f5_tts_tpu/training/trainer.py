"""CFM trainer: optax AdamW + warmup/cosine schedule, jitted train step,
checkpointing, periodic sampling with mel-trajectory GIF visualization.

Behavioral parity with reference: trainer.py, TPU-first mechanics:
  - one jitted train step (value_and_grad -> global-norm clip -> AdamW) with
    explicit PRNG keys instead of MLX's captured global state
    (reference: trainer.py:214-231)
  - the same step compiles under a device mesh with DP batch sharding and
    optional TP parameter sharding (see parallel/mesh.py); single-chip is the
    1-device special case
  - checkpoints are written in the MLX-compatible flat naming via
    models/convert.export_dit_state, so they interoperate with the reference
    ecosystem; full train-state (optimizer + schedule step) is additionally
    saved, fixing the reference's weights-only resume that restarts the LR
    schedule (reference: trainer.py:67-79, noted in SURVEY.md §5)
"""

from __future__ import annotations

import datetime
import os
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import optax

from f5_tts_tpu.audio.mel import MelSpec
from f5_tts_tpu.config import CFMConfig, DiTConfig
from f5_tts_tpu.models.cfm import F5TTS, cfm_loss
from f5_tts_tpu.models.convert import convert_dit_state, export_dit_state, to_mlx_model_naming
from f5_tts_tpu.utils.modules import Params

# RMS floor for probe-sample reference audio (reference: trainer.py:45);
# sample-rate/hop arithmetic derives from the model's AudioConfig.
TARGET_RMS = 0.1


def make_lr_schedule(
    learning_rate: float = 1e-4,
    num_warmup_steps: int = 1000,
    total_steps: int = 1_000_000,
) -> optax.Schedule:
    return optax.join_schedules(
        [
            optax.linear_schedule(1e-8, learning_rate, num_warmup_steps),
            optax.cosine_decay_schedule(learning_rate, max(total_steps - num_warmup_steps, 1)),
        ],
        boundaries=[num_warmup_steps],
    )


def make_optimizer(
    learning_rate: float = 1e-4,
    weight_decay: float = 1e-2,
    num_warmup_steps: int = 1000,
    total_steps: int = 1_000_000,
    max_grad_norm: float = 1.0,
) -> optax.GradientTransformation:
    """Linear warmup (1e-8 -> lr) then cosine decay, AdamW, global-norm clip
    (reference: trainer.py:186-198, 226-227)."""
    schedule = make_lr_schedule(learning_rate, num_warmup_steps, total_steps)
    tx = optax.adamw(schedule, weight_decay=weight_decay)
    if max_grad_norm > 0:
        tx = optax.chain(optax.clip_by_global_norm(max_grad_norm), tx)
    return tx


def init_train_state(
    params: Params, optimizer: optax.GradientTransformation, ema: bool = False
) -> dict:
    state = {
        "params": params,
        "opt_state": optimizer.init(params),
        "step": jnp.zeros((), jnp.int32),
    }
    if ema:
        # distinct buffers (one jitted copy): aliasing params would double-
        # donate under jit(donate_argnums=(0,))
        state["ema"] = jax.jit(lambda t: jax.tree.map(lambda x: x + 0, t))(params)
    return state


def _build_step(
    loss_fn,
    optimizer: optax.GradientTransformation,
    ema_decay: float | None,
    grad_accum: int,
    grad_shardings=None,
):
    """Shared step builder. `loss_fn(params, inp, text, lens, key) -> scalar`.

    grad_accum == 1: one value_and_grad -> clip/AdamW -> (optional) EMA.

    grad_accum == k > 1: inputs carry a leading microbatch axis [k, b, ...];
    a `lax.scan` runs fwd+bwd per microbatch (activation memory stays at
    microbatch scale) and accumulates gradients in a float32 carry, then ONE
    optimizer/EMA update applies the mean — the TPU-idiomatic large-effective-
    batch step: one jit, static shapes, no per-microbatch dispatch. Each
    microbatch draws its own folded PRNG key and its loss is the masked mean
    over ITS OWN span elements, so microbatches weight equally (exactly what k
    independent steps would each compute); the reported loss is their mean.

    `grad_shardings` (a NamedSharding pytree mirroring the params — see
    parallel/mesh.grad_shardings) pins the accumulation carry to the params'
    placement on a mesh: without it GSPMD propagation is free to pick its own
    layouts for the carried gradients inside the scan. Under FSDP this is the
    ZeRO-correct choice — the f32 carry is params-sized, so gradients must
    accumulate already reduce-scattered to their 1/data-th shard rather than
    replicated (full f32 param footprint per device)."""

    def apply_update(state, grads, loss):
        updates, opt_state = optimizer.update(grads, state["opt_state"], state["params"])
        params = optax.apply_updates(state["params"], updates)
        new_state = {"params": params, "opt_state": opt_state, "step": state["step"] + 1}
        if ema_decay is not None:
            new_state["ema"] = jax.tree.map(
                lambda e, p: ema_decay * e + (1.0 - ema_decay) * p, state["ema"], params
            )
        return new_state, loss

    if grad_accum <= 1:

        def train_step(state: dict, inp: jax.Array, text: jax.Array, lens: jax.Array, key: jax.Array):
            loss, grads = jax.value_and_grad(loss_fn)(state["params"], inp, text, lens, key)
            return apply_update(state, grads, loss)

        return train_step

    k = int(grad_accum)

    def constrain(grads):
        if grad_shardings is None:
            return grads
        return jax.tree.map(jax.lax.with_sharding_constraint, grads, grad_shardings)

    def train_step(state: dict, inp: jax.Array, text: jax.Array, lens: jax.Array, key: jax.Array):
        keys = jax.random.split(key, k)

        def micro(carry, xs):
            g_acc, l_acc = carry
            inp_i, text_i, lens_i, key_i = xs
            loss, grads = jax.value_and_grad(loss_fn)(
                state["params"], inp_i, text_i, lens_i, key_i
            )
            g_acc = constrain(jax.tree.map(
                lambda a, g: a + g.astype(jnp.float32), g_acc, grads
            ))
            return (g_acc, l_acc + loss.astype(jnp.float32)), None

        zeros = constrain(jax.tree.map(
            lambda p: jnp.zeros(p.shape, jnp.float32), state["params"]
        ))
        (g_sum, l_sum), _ = jax.lax.scan(
            micro, (zeros, jnp.zeros((), jnp.float32)), (inp, text, lens, keys)
        )
        grads = jax.tree.map(
            lambda g, p: (g / k).astype(p.dtype), g_sum, state["params"]
        )
        return apply_update(state, grads, l_sum / k)

    return train_step


def make_train_step(
    dit_cfg: DiTConfig,
    cfm_cfg: CFMConfig,
    optimizer: optax.GradientTransformation,
    ema_decay: float | None = None,
    grad_accum: int = 1,
    grad_shardings=None,
):
    """Build the pure (state, batch, key) -> (state, loss) step. Callers jit it
    (optionally with shardings; see parallel/mesh.py and __graft_entry__).

    With `ema_decay`, the state carries an exponential moving average of the
    params — the form the published F5-TTS checkpoints are in ("ema_model.*"
    keys; the reference trainer itself never maintains one, trainer.py).

    With `grad_accum=k > 1`, inputs take a leading microbatch axis
    ([k, b, n, d] mel / [k, b, nt] text / [k, b] lens) and the step runs k
    sequential fwd+bwd passes inside one jit before a single optimizer update
    (see _build_step) — large effective batches without the activation memory
    of one giant batch. The reference has no equivalent (its trainer is
    single-step only, reference: trainer.py:214-231)."""

    def loss_fn(p, mel, text, lens, key):
        return cfm_loss(p, dit_cfg, cfm_cfg, key, mel, text, lens)

    return _build_step(loss_fn, optimizer, ema_decay, grad_accum, grad_shardings)


def make_train_step_from_audio(
    dit_cfg: DiTConfig,
    cfm_cfg: CFMConfig,
    optimizer: optax.GradientTransformation,
    ema_decay: float | None = None,
    audio_cfg: "AudioConfig | None" = None,
    grad_accum: int = 1,
    grad_shardings=None,
):
    """Train step taking RAW audio [b, n_samples]: the mel front-end runs
    inside the jitted step ON THE ACCELERATOR (µs of MXU time) instead of on
    the host (the CPU mel is ~120 s-audio/s single-threaded and throttles the
    pipeline below the step's consumption rate — tools/loader_bench.py).
    The reference computes mel in its C++ loader (data.py:81-86); moving it
    on-device is the TPU-idiomatic equivalent (SURVEY.md §2b).

    Semantics match the host-mel step exactly: audio must be zero-padded to
    a whole frame-bucket (collate_raw_audio_batch), and the padded frames are
    re-zeroed after the mel (the training forward uses no attention mask —
    reference cfm.py:234-241 — so the cond padding value is load-bearing).

    With `grad_accum=k > 1`, audio takes a leading microbatch axis
    [k, b, n_samples] (text/lens likewise) and the mel runs per microbatch
    inside the accumulation scan — see make_train_step."""
    from f5_tts_tpu.audio.mel import log_mel_spectrogram
    from f5_tts_tpu.config import AudioConfig

    acfg = audio_cfg or AudioConfig()

    def loss_fn(p, audio, text, lens, key):
        mel = log_mel_spectrogram(
            audio, sample_rate=acfg.sample_rate, n_mels=acfg.n_mels,
            n_fft=acfg.n_fft, hop_length=acfg.hop_length,
        )
        frames = jnp.arange(mel.shape[1])[None, :]
        mel = jnp.where((frames < lens[:, None])[..., None], mel, 0.0)
        return cfm_loss(p, dit_cfg, cfm_cfg, key, mel, text, lens)

    return _build_step(loss_fn, optimizer, ema_decay, grad_accum, grad_shardings)


def split_microbatches(grad_accum: int, *arrays, data_size: int | None = None):
    """Reshape per-batch arrays [b, ...] into microbatch form
    [grad_accum, b // grad_accum, ...] for an accumulated step (the leading
    axis is scanned serially inside the jitted step — see _build_step).
    Shared by both trainers so the divisibility contract lives in one place.
    Arrays pass through unchanged when grad_accum == 1.

    `data_size` (the mesh's data-axis size, when training under a mesh)
    validates DP divisibility up front: the microbatch must split evenly
    across the data axis, and the raw GSPMD error for that is cryptic."""
    b = arrays[0].shape[0]
    if b % grad_accum:
        raise ValueError(
            f"batch size {b} is not divisible by grad_accum={grad_accum}"
        )
    micro = b // grad_accum
    if data_size and micro % data_size:
        raise ValueError(
            f"microbatch size {micro} (batch {b} / grad_accum {grad_accum}) "
            f"is not divisible by the mesh's data-axis size {data_size}"
        )
    if grad_accum <= 1:
        return arrays
    return tuple(a.reshape(grad_accum, micro, *a.shape[1:]) for a in arrays)


class F5TTSTrainer:
    """Training driver (reference API: trainer.py:52-295)."""

    def __init__(
        self,
        model: F5TTS,
        num_warmup_steps: int = 1000,
        max_grad_norm: float = 1.0,
        sample_rate: int | None = None,  # defaults to the model's AudioConfig
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
        self.mel_spectrogram = MelSpec(
            sample_rate=sample_rate if sample_rate is not None else model.audio_cfg.sample_rate
        )
        self.log_with_wandb = log_with_wandb
        self.results_dir = Path(results_dir)
        self.mesh = mesh
        self.ema_decay = ema_decay
        self.use_orbax = use_orbax
        # ZeRO/FSDP: shard params + optimizer moments over the mesh's data
        # axis (parallel/mesh._with_fsdp) — for models whose replicated
        # train state wouldn't fit one chip. No effect without a mesh.
        self.fsdp = fsdp
        self.ckpt_mgr = None
        self.state: dict | None = None

    # ------------------------------------------------------------ checkpoint

    def save_checkpoint(self, step: int) -> None:
        """Weights in MLX-compatible flat safetensors (loadable by the
        reference) + full train state for exact resume."""
        os.makedirs(self.results_dir, exist_ok=True)
        from safetensors.numpy import save_file

        # full-model MLX naming ("transformer." prefix + rotary inv_freq):
        # the convention the reference trainer writes and load_weights expects
        # (reference: trainer.py:67-79)
        dim_head = self.model.dit_cfg.dim_head
        flat = to_mlx_model_naming(
            export_dit_state(self.state["params"] if self.state else self.model.params), dim_head
        )
        save_file({k: np.ascontiguousarray(np.asarray(v)) for k, v in flat.items()},
                  self.results_dir / f"f5tts_{step}.safetensors")

        if self.state is not None and "ema" in self.state:
            ema_flat = to_mlx_model_naming(export_dit_state(self.state["ema"]), dim_head)
            save_file({k: np.ascontiguousarray(np.asarray(v)) for k, v in ema_flat.items()},
                      self.results_dir / f"f5tts_{step}.ema.safetensors")

        if self.state is not None:
            from f5_tts_tpu.training.checkpoints import save_train_state

            save_train_state(
                self.ckpt_mgr, step, self.state,
                self.results_dir / f"f5tts_{step}.trainstate.safetensors",
            )

    def _restore_orbax(self, step: int) -> dict:
        from f5_tts_tpu.training.checkpoints import restore_orbax_adapting_ema

        return restore_orbax_adapting_ema(self.ckpt_mgr, step, self.state)

    def load_checkpoint(self, step: int) -> None:
        from safetensors.numpy import load_file

        flat = load_file(self.results_dir / f"f5tts_{step}.safetensors")
        self.model.params = convert_dit_state(flat, self.model.dit_cfg)
        if self.state is not None:
            self.state["params"] = self.model.params
            ema_path = self.results_dir / f"f5tts_{step}.ema.safetensors"
            if "ema" in self.state and ema_path.exists():
                self.state["ema"] = convert_dit_state(load_file(ema_path), self.model.dit_cfg)
            from f5_tts_tpu.training.checkpoints import restore_train_state_file

            restore_train_state_file(
                self.state,
                self.results_dir / f"f5tts_{step}.trainstate.safetensors",
                "the reference's resume bug, trainer.py:67-79",
            )

    def _latest_checkpoint_step(self) -> int | None:
        from f5_tts_tpu.training.checkpoints import latest_checkpoint_step

        return latest_checkpoint_step(self.results_dir, "f5tts_", self.ckpt_mgr)

    # ------------------------------------------------------------ sampling

    def generate_sample(
        self,
        sample_audio: str,
        sample_ref_text: str,
        sample_generation_text: str,
        sample_generation_duration: float,
        step: int,
        samples_dir: str = "samples",
    ) -> None:
        """Synthesize a probe utterance and save wav + mel-trajectory GIF
        (reference: trainer.py:81-161)."""
        from f5_tts_tpu.audio.io import read_wav, write_wav

        acfg = self.model.audio_cfg
        audio, _ = read_wav(sample_audio)
        if audio.ndim > 1:
            audio = audio.mean(axis=-1)
        ref_audio_duration = audio.shape[0] / acfg.sample_rate
        rms = float(np.sqrt(np.mean(np.square(audio))))
        if rms < TARGET_RMS:
            audio = audio * TARGET_RMS / rms

        text = [sample_ref_text + " " + sample_generation_text]
        start_date = datetime.datetime.now()
        # sample with EMA weights when tracked (what the published checkpoints
        # are, and what upstream F5-TTS evaluates with)
        saved_params = self.model.params
        if self.state is not None and "ema" in self.state:
            self.model.params = self.state["ema"]
        wave, trajectories = self.model.sample(
            jnp.asarray(audio)[None, :],
            text=text,
            duration=int(
                (ref_audio_duration + sample_generation_duration) * acfg.frames_per_second
            ),
            method="rk4",
            steps=8,
            cfg_strength=2.0,
            speed=1,
            sway_sampling_coef=-1.0,
        )
        self.model.params = saved_params
        wave = np.asarray(wave)
        elapsed = (datetime.datetime.now() - start_date).total_seconds()
        print(f"Generated sample at step {step} in {elapsed:0.1f}s")

        os.makedirs(f"{samples_dir}/audio", exist_ok=True)
        if self.model._vocoder is not None:
            write_wav(
                f"{samples_dir}/audio/step_{step}.wav", wave[audio.shape[0]:], acfg.sample_rate
            )

        self._save_trajectory_gif(
            np.asarray(trajectories), audio.shape[0] // acfg.hop_length, step, samples_dir
        )

    def _save_trajectory_gif(self, trajectories: np.ndarray, ref_frames: int, step: int, samples_dir: str) -> None:
        """Mel trajectory animation (reference: trainer.py:129-159)."""
        try:
            import io as _io

            import matplotlib

            matplotlib.use("Agg")
            import matplotlib.pyplot as plt
            from PIL import Image
        except ImportError:
            return

        frames = []
        for traj in trajectories:
            plt.figure(figsize=(10, 4))
            plt.imshow(traj[0, ref_frames:].T, aspect="auto", origin="lower", interpolation="none")
            plt.yticks([])
            buf = _io.BytesIO()
            plt.savefig(buf, format="png")
            buf.seek(0)
            frames.append(Image.open(buf))
            plt.close()

        os.makedirs(f"{samples_dir}/viz", exist_ok=True)
        frames[0].save(
            f"{samples_dir}/viz/step_{step}.gif",
            save_all=True,
            append_images=frames[1:],
            duration=300,
            loop=0,
        )

    # ------------------------------------------------------------ training

    def train(
        self,
        train_dataset,
        learning_rate: float = 1e-4,
        weight_decay: float = 1e-2,
        total_steps: int = 1_000_000,
        save_every: int = 10_000,
        sample_every: int = 5_000,
        sample_reference_audio: str | None = None,
        sample_reference_text: str | None = None,
        sample_generation_text: str | None = None,
        sample_generation_duration: float | None = None,
        checkpoint: int | str | None = None,  # step number or "latest"
        log_every: int = 10,
        seed: int = 0,
        on_device_mel: bool = False,
        grad_accum: int = 1,
    ) -> None:
        """Main loop (reference: trainer.py:163-295). `train_dataset` yields
        dicts with "mel_spec" [b, n, d] (or [b, 1, n, d]), "mel_len" [b], and
        "transcript" [b, nt] int ids padded with -1 — or, with
        on_device_mel=True, "audio" [b, n_samples] raw batches
        (data.loader.make_training_pipeline(on_device_mel=True)) whose mel is
        computed inside the jitted step on the accelerator.

        `grad_accum=k > 1` splits each yielded batch into k equal microbatches
        processed sequentially inside ONE jitted step (lax.scan) before a
        single optimizer update: the effective batch is the full yielded batch
        while activation memory stays at batch/k scale. The yielded batch size
        must be divisible by k. One optimizer update per yielded batch — the
        step counter, LR schedule, EMA, and checkpoints all count UPDATES."""
        if self.log_with_wandb:
            import wandb

            wandb.init(project="f5tts", config=dict(learning_rate=learning_rate, total_steps=total_steps))

        optimizer = make_optimizer(
            learning_rate, weight_decay, self.num_warmup_steps, total_steps, self.max_grad_norm
        )
        lr_schedule = make_lr_schedule(learning_rate, self.num_warmup_steps, total_steps)
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
                        "from the safetensors files (full train state when a "
                        ".trainstate file exists, else weights-only)"
                    )
                self.load_checkpoint(checkpoint)
            start_step = checkpoint
            print(f"Starting training at step {start_step}")

        if grad_accum < 1:
            raise ValueError(f"grad_accum must be >= 1, got {grad_accum}")
        g_shardings = None
        if self.mesh is not None and grad_accum > 1:
            # pin the accumulation carry to the params' mesh placement (see
            # _build_step's grad_shardings note)
            from f5_tts_tpu.parallel.mesh import grad_shardings as _gsh

            g_shardings = _gsh(self.state["params"], self.mesh, fsdp=self.fsdp)
        if on_device_mel:
            step_fn = make_train_step_from_audio(
                self.model.dit_cfg, self.model.cfm_cfg, optimizer,
                ema_decay=self.ema_decay, audio_cfg=self.model.audio_cfg,
                grad_accum=grad_accum, grad_shardings=g_shardings,
            )
        else:
            step_fn = make_train_step(
                self.model.dit_cfg, self.model.cfm_cfg, optimizer,
                ema_decay=self.ema_decay, grad_accum=grad_accum,
                grad_shardings=g_shardings,
            )
        if self.mesh is not None:
            from f5_tts_tpu.parallel.mesh import shard_train_step

            train_step = shard_train_step(
                step_fn, self.mesh, self.state, grad_accum=grad_accum,
                fsdp=self.fsdp,
            )
            from f5_tts_tpu.parallel.mesh import shard_state

            self.state = shard_state(self.state, self.mesh, fsdp=self.fsdp)
        else:
            train_step = jax.jit(step_fn, donate_argnums=(0,))

        root_key = jax.random.key(seed)
        global_step = start_step
        training_start_date = datetime.datetime.now()

        from tqdm import tqdm

        pbar = tqdm(initial=start_step, total=total_steps, desc="", unit="step")

        try:
            for batch in train_dataset:
                if on_device_mel:
                    inp = jnp.asarray(batch["audio"])  # [b, n_samples]
                    seq_len = inp.shape[1] // self.model.audio_cfg.hop_length
                else:
                    inp = jnp.asarray(batch["mel_spec"])
                    if inp.ndim == 4:  # [b, 1, n, d] from per-item mel transforms
                        inp = inp[:, 0]
                    seq_len = inp.shape[1]
                mel_lens = jnp.asarray(batch["mel_len"], dtype=jnp.int32).reshape(-1)
                text = np.asarray(batch["transcript"])
                if text.ndim == 3:
                    text = text[:, :, 0] if text.shape[-1] == 1 else text[:, 0]
                if text.shape[-1] < seq_len:
                    text = np.pad(text, ((0, 0), (0, seq_len - text.shape[-1])), constant_values=-1)
                text = jnp.asarray(text[:, :seq_len], dtype=jnp.int32)

                inp, text, mel_lens = split_microbatches(
                    grad_accum, inp, text, mel_lens,
                    data_size=(self.mesh.shape.get("data")
                               if self.mesh is not None else None),
                )

                key = jax.random.fold_in(root_key, global_step)
                self.state, loss = train_step(self.state, inp, text, mel_lens, key)

                global_step += 1
                if global_step % log_every == 0 or global_step == start_step + 1:
                    loss_val = float(loss)
                    batch_len = int(mel_lens.sum())
                    if self.log_with_wandb:
                        import wandb

                        # lr at the schedule position this step's update used
                        # (reference logs lr per step: trainer.py:256-264)
                        lr_val = float(lr_schedule(global_step - 1))
                        wandb.log(
                            {"loss": loss_val, "batch_len": batch_len, "lr": lr_val},
                            step=global_step,
                        )
                    pbar.set_postfix({"loss": f"{loss_val:.4f}", "batch_len": f"{batch_len:04d}"})
                pbar.update(1)

                if global_step % save_every == 0:
                    self.model.params = self.state["params"]
                    self.save_checkpoint(global_step)

                if (
                    global_step % sample_every == 0
                    and sample_reference_audio is not None
                    and sample_reference_text is not None
                    and sample_generation_text is not None
                    and sample_generation_duration is not None
                ):
                    self.model.params = self.state["params"]
                    self.generate_sample(
                        sample_reference_audio,
                        sample_reference_text,
                        sample_generation_text,
                        sample_generation_duration,
                        global_step,
                    )

                if global_step >= total_steps:
                    break

        finally:
            pbar.close()
            self.model.params = self.state["params"]
            if self.ckpt_mgr is not None:
                # flush pending async writes even on an exception mid-loop,
                # so the newest checkpoint is never lost to a crash
                self.ckpt_mgr.wait()
            if self.log_with_wandb:
                import wandb

                wandb.finish()

        print(f"Training complete in {datetime.datetime.now() - training_start_date}")
