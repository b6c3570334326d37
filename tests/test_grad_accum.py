"""Gradient accumulation: a lax.scan over microbatches inside ONE jitted step
(f32 gradient carry, single optimizer/EMA update per call).

The reference trainer has no accumulation (reference: trainer.py:214-231, one
fwd+bwd per optimizer update); this is the repo's large-effective-batch
feature — effective batch k*b at microbatch-b activation memory, with the
TPU-idiomatic mechanics (one jit, static shapes, serial scan)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from f5_tts_tpu.config import CFMConfig, DiTConfig
from f5_tts_tpu.models.cfm import cfm_loss
from f5_tts_tpu.models.dit import init_dit
from f5_tts_tpu.training.trainer import (
    init_train_state,
    make_optimizer,
    make_train_step,
    make_train_step_from_audio,
)

TINY = DiTConfig(
    dim=64, depth=2, heads=2, dim_head=32, ff_mult=2, mel_dim=100,
    text_num_embeds=256, text_dim=32, conv_layers=1, use_flash_attention=False,
)
CFM = CFMConfig()


def _micro_batches(k=2, b=2, n=64, key=0):
    ks = jax.random.split(jax.random.key(key), 2)
    mel = jax.random.normal(ks[0], (k, b, n, 100))
    text = jax.random.randint(ks[1], (k, b, 16), 0, 255)
    lens = jnp.full((k, b), n, jnp.int32)
    return mel, text, lens


def test_grad_accum_matches_manual_average():
    """The accumulated step must equal: per-microbatch grads (same folded
    keys), f32 mean, one optimizer update, one EMA update."""
    k = 3
    params = init_dit(jax.random.key(0), TINY)
    opt = make_optimizer(learning_rate=1e-3, num_warmup_steps=1, total_steps=100)
    mel, text, lens = _micro_batches(k=k)
    key = jax.random.key(11)

    state = init_train_state(params, opt, ema=True)
    step = jax.jit(make_train_step(TINY, CFM, opt, ema_decay=0.99, grad_accum=k))
    new_state, loss = step(state, mel, text, lens, key)

    # manual reference computation
    keys = jax.random.split(key, k)
    g_sum = jax.tree.map(lambda p: jnp.zeros(p.shape, jnp.float32), params)
    l_sum = 0.0
    for i in range(k):
        li, gi = jax.value_and_grad(
            lambda p: cfm_loss(p, TINY, CFM, keys[i], mel[i], text[i], lens[i])
        )(params)
        g_sum = jax.tree.map(lambda a, g: a + g.astype(jnp.float32), g_sum, gi)
        l_sum = l_sum + float(li)
    grads = jax.tree.map(lambda g, p: (g / k).astype(p.dtype), g_sum, params)
    updates, _ = opt.update(grads, state["opt_state"], params)
    want_params = optax.apply_updates(params, updates)

    np.testing.assert_allclose(float(loss), l_sum / k, rtol=1e-6)
    diffs = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()),
                         new_state["params"], want_params)
    assert max(jax.tree.leaves(diffs)) < 1e-6
    # one update: step counts optimizer updates, EMA applied once on the
    # post-update params
    assert int(new_state["step"]) == 1
    want_ema = jax.tree.map(lambda e, p: 0.99 * e + 0.01 * p, params, want_params)
    ema_diffs = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()),
                             new_state["ema"], want_ema)
    assert max(jax.tree.leaves(ema_diffs)) < 1e-6


def test_grad_accum_from_audio_matches_mel_path():
    """Accumulated raw-audio step == accumulated mel step fed the same mel
    (the on-device mel + padded-frame re-zero runs inside the scan)."""
    from f5_tts_tpu.audio.mel import log_mel_spectrogram

    k, b, n = 2, 2, 64
    rng = np.random.default_rng(4)
    audio = (0.1 * rng.standard_normal((k, b, n * 256))).astype(np.float32)
    lens = jnp.full((k, b), n, jnp.int32)
    lens = lens.at[0, 0].set(n - 16)  # one short sample exercises the re-zero
    text = jnp.asarray(rng.integers(0, 255, (k, b, 16)), jnp.int32)
    key = jax.random.key(9)

    mel = log_mel_spectrogram(jnp.asarray(audio.reshape(k * b, -1))).reshape(
        k, b, n, 100
    )
    frames = jnp.arange(n)[None, None, :]
    mel = jnp.where((frames < lens[..., None])[..., None], mel, 0.0)

    params = init_dit(jax.random.key(0), TINY)
    opt = make_optimizer()

    s1 = init_train_state(params, opt)
    s1, l1 = jax.jit(make_train_step(TINY, CFM, opt, grad_accum=k))(
        s1, mel, text, lens, key)
    s2 = init_train_state(params, opt)
    s2, l2 = jax.jit(make_train_step_from_audio(TINY, CFM, opt, grad_accum=k))(
        s2, jnp.asarray(audio), text, lens, key)

    assert abs(float(l1) - float(l2)) < 1e-5
    diffs = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()),
                         s1["params"], s2["params"])
    assert max(jax.tree.leaves(diffs)) < 1e-5


def test_grad_accum_sharded_matches_unsharded():
    """grad_accum under a DPxTP mesh: the microbatch axis is replicated (the
    scan is serial), each microbatch shards over "data" exactly as k=1."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from f5_tts_tpu.parallel.mesh import create_mesh, shard_state, shard_train_step

    k = 2
    params = init_dit(jax.random.key(0), TINY)
    opt = make_optimizer(learning_rate=1e-3, num_warmup_steps=1, total_steps=100)
    step_fn = make_train_step(TINY, CFM, opt, grad_accum=k)
    mel, text, lens = _micro_batches(k=k, b=4)
    key = jax.random.key(3)

    state1 = init_train_state(params, opt)
    state1, loss1 = jax.jit(step_fn)(state1, mel, text, lens, key)

    mesh = create_mesh(data=4, model=2)
    state2 = shard_state(init_train_state(params, opt), mesh)
    sharded = shard_train_step(step_fn, mesh, state2, grad_accum=k)
    dsh = NamedSharding(mesh, P(None, "data"))
    state2, loss2 = sharded(
        state2, jax.device_put(mel, dsh), jax.device_put(text, dsh),
        jax.device_put(lens, dsh), key,
    )
    np.testing.assert_allclose(float(loss1), float(loss2), rtol=2e-4)
    k1 = np.asarray(state1["params"]["proj_out"]["kernel"])
    k2 = np.asarray(state2["params"]["proj_out"]["kernel"])
    np.testing.assert_allclose(k1, k2, atol=2e-5)


def test_fsdp_sharded_matches_unsharded():
    """FSDP (ZeRO): params + Adam moments sharded over "data"
    (parallel/mesh._with_fsdp) must produce the same step as the replicated
    layout — GSPMD gathers weights at use sites and reduce-scatters grads."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from f5_tts_tpu.parallel.mesh import create_mesh, shard_state, shard_train_step

    params = init_dit(jax.random.key(0), TINY)
    opt = make_optimizer(learning_rate=1e-3, num_warmup_steps=1, total_steps=100)
    step_fn = make_train_step(TINY, CFM, opt)
    mel, text, lens = _micro_batches(k=1, b=4)
    mel, text, lens = mel[0], text[0], lens[0]
    key = jax.random.key(3)

    state1 = init_train_state(params, opt)
    state1, loss1 = jax.jit(step_fn)(state1, mel, text, lens, key)

    mesh = create_mesh(data=4, model=2)
    state2 = shard_state(init_train_state(params, opt), mesh, fsdp=True)
    # the point of ZeRO: a weight matrix and its mirrored Adam moments live
    # 1/data-th per device
    assert "data" in state2["params"]["proj_out"]["kernel"].sharding.spec
    sharded = shard_train_step(step_fn, mesh, state2, fsdp=True)
    dsh = NamedSharding(mesh, P("data"))
    state2, loss2 = sharded(
        state2, jax.device_put(mel, dsh), jax.device_put(text, dsh),
        jax.device_put(lens, dsh), key,
    )
    np.testing.assert_allclose(float(loss1), float(loss2), rtol=2e-4)
    k1 = np.asarray(state1["params"]["proj_out"]["kernel"])
    k2 = np.asarray(state2["params"]["proj_out"]["kernel"])
    np.testing.assert_allclose(k1, k2, atol=2e-5)
    # scan-stacked depth leaves must NOT shard their leading depth axis
    for leaf in jax.tree.leaves(
        jax.tree.map(lambda x: x.sharding.spec, state2["params"]["blocks"]),
        is_leaf=lambda s: isinstance(s, P),
    ):
        assert len(leaf) == 0 or leaf[0] is None


def test_fsdp_specs_never_shard_stacked_depth_axis():
    """The never-shard-depth invariant at a REALISTIC shape: base config has
    depth=22 and common data axes (2, 11) divide it, so a [depth, dim] stacked
    bias whose dim is already taken by "model" (TP) must stay replicated on
    depth — not fall through to P("data", "model") (parallel/mesh._with_fsdp).
    The text embedding's ConvNeXt list named "blocks" is NOT scan-stacked and
    must still be eligible for FSDP."""
    from f5_tts_tpu.parallel.mesh import param_specs

    cfg = DiTConfig(
        dim=64, depth=4, heads=2, dim_head=32, ff_mult=2, mel_dim=100,
        text_num_embeds=256, text_dim=32, conv_layers=1,
        use_flash_attention=False,
    )
    params = init_dit(jax.random.key(0), cfg)
    for data in (2, 4):  # both divide depth=4 — the masked failure mode
        specs = param_specs(params, fsdp_data_size=data)
        for path, spec in jax.tree_util.tree_flatten_with_path(
            specs["blocks"], is_leaf=lambda s: isinstance(s, jax.sharding.PartitionSpec)
        )[0]:
            assert len(spec) == 0 or spec[0] is None, (
                f"blocks{jax.tree_util.keystr(path)} shards its scan-stacked "
                f"depth axis: {spec}"
            )
        # non-stacked matrices still pick up a "data" dim (ZeRO is active)
        assert "data" in tuple(specs["proj_out"]["kernel"])
        # the whole text embedding is exempt from FSDP
        # (parallel/mesh._FSDP_EXEMPT_RE): any "data"-sharded leaf whose
        # gradient flows through the ConvNeXt stack makes GSPMD re-shard the
        # depthwise-conv kernels inconsistently between fwd/bwd under
        # FSDP x SP (involuntary full rematerialization)
        te = jax.tree.leaves(
            jax.tree.map(tuple, specs["text_embed"]),
            is_leaf=lambda s: isinstance(s, tuple),
        )
        assert all("data" not in s for s in te)
        # ...but the exemption must not spill onto OTHER non-stacked
        # matrices: the input projection [2*mel+text_dim, dim] still shards
        assert "data" in tuple(specs["input_embed"]["proj"]["kernel"])


def test_trainer_grad_accum_loop(tmp_path):
    """F5TTSTrainer.train(grad_accum=2) reshapes each yielded batch into
    microbatches and counts UPDATES (one per yielded batch)."""
    import os

    from f5_tts_tpu.models.cfm import F5TTS
    from f5_tts_tpu.training import F5TTSTrainer

    model = F5TTS.init(jax.random.key(0), TINY, cfm_cfg=CFM)

    def dataset(b=4):
        ks = jax.random.split(jax.random.key(1), 2)
        for i in range(4):
            yield {
                "mel_spec": np.asarray(jax.random.normal(ks[0], (b, 64, 100))),
                "mel_len": np.full((b,), 64, np.int32),
                "transcript": np.asarray(
                    jax.random.randint(ks[1], (b, 16), 0, 255)),
            }

    trainer = F5TTSTrainer(model, num_warmup_steps=2, results_dir=tmp_path)
    trainer.train(dataset(), learning_rate=1e-4, total_steps=4, save_every=4,
                  sample_every=10**9, log_every=2, grad_accum=2)
    assert int(trainer.state["step"]) == 4
    assert "f5tts_4.safetensors" in os.listdir(tmp_path)

    # non-divisible batch fails loudly
    trainer2 = F5TTSTrainer(model, num_warmup_steps=2, results_dir=tmp_path)
    with pytest.raises(ValueError, match="not divisible"):
        trainer2.train(dataset(b=3), total_steps=1, save_every=10**9,
                       sample_every=10**9, grad_accum=2)
