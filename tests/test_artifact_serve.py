"""Artifact-backed deployment server (f5_tts_tpu/artifact_serve.py): serving
from AOT sampler artifacts with no model weights loaded — bucket selection,
the HTTP surface, and equality with driving the export API directly.

reference: no counterpart (the reference has no serving or deployment
surface; SURVEY.md §5)."""

import base64
import io
import json
import threading
import urllib.error
import urllib.request
import wave as wave_mod

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from f5_tts_tpu import export as E
from f5_tts_tpu.artifact_serve import ArtifactSampler, serve_artifacts
from f5_tts_tpu.config import CFMConfig, DiTConfig, VocosConfig
from f5_tts_tpu.models.cfm import F5TTS
from f5_tts_tpu.models.vocos import Vocos

HOP = 256
SR = 24_000


@pytest.fixture(scope="module")
def model():
    cfg = DiTConfig(dim=64, depth=2, heads=2, dim_head=32, ff_mult=2, mel_dim=100,
                    text_num_embeds=256, text_dim=32, conv_layers=1,
                    use_flash_attention=False)
    voc = Vocos.init(jax.random.key(1),
                     VocosConfig(dim=64, intermediate_dim=128, num_layers=2))
    return F5TTS.init(jax.random.key(0), cfg, cfm_cfg=CFMConfig(duration_bucket=64),
                      vocab_char_map=None, vocoder=voc.decode)


@pytest.fixture(scope="module")
def artifacts(model, tmp_path_factory):
    """Two buckets (64 and 128 frames), batch=1, external weights."""
    tmp = tmp_path_factory.mktemp("artifacts")
    paths = []
    for padded in (64, 128):
        exp = E.export_sampler(model, batch=1, padded_len=padded, steps=2,
                               method="euler", embed_weights=False)
        p = tmp / f"b{padded}.bin"
        E.save_sampler(exp, p, model=model)
        paths.append(str(p))
    return paths


@pytest.fixture(scope="module")
def ref():
    rng = np.random.default_rng(0)
    return (0.1 * rng.standard_normal(20 * HOP)).astype(np.float32)  # 20 frames


@pytest.fixture(scope="module")
def server(artifacts, ref):
    httpd = serve_artifacts(artifacts, default_ref=(ref, "ref words"),
                            host="127.0.0.1", port=0)
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{httpd.server_address[1]}", httpd
    httpd.batcher.stop()
    httpd.shutdown()


def _post(url, payload, timeout=120):
    req = urllib.request.Request(
        url + "/synthesize", data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"}, method="POST",
    )
    return urllib.request.urlopen(req, timeout=timeout)


def test_default_ref_rate_validated(artifacts, ref):
    """A default --ref at the wrong rate must fail at STARTUP (previously it
    silently conditioned on wrong-speed mel), or resample under
    --resample-ref."""
    with pytest.raises(ValueError, match="16000 Hz"):
        serve_artifacts(artifacts, default_ref=(ref, "x"), default_ref_sr=16_000,
                        host="127.0.0.1", port=0)
    httpd = serve_artifacts(artifacts, default_ref=(ref, "x"),
                            default_ref_sr=16_000, host="127.0.0.1", port=0,
                            allow_resample=True)
    httpd.batcher.stop()
    httpd.server_close()


def test_bucket_selection(artifacts):
    s = ArtifactSampler(artifacts)
    assert [b.spec.padded_len for b in s.buckets] == [64, 128]
    assert s.pick_length(40) == 64
    assert s.pick_length(64) == 64
    assert s.pick_length(65) == 128
    with pytest.raises(ValueError, match="largest artifact bucket"):
        s.pick_length(129)


def test_pick_artifact_prefers_smallest_fitting_batch(model, tmp_path):
    """Within one bucket length, a group of k requests routes to the smallest
    exported batch >= k (else the largest, and the batcher chunks)."""
    paths = []
    for b in (1, 4):
        exp = E.export_sampler(model, batch=b, padded_len=64, steps=2,
                               method="euler", embed_weights=False)
        p = tmp_path / f"b{b}.bin"
        E.save_sampler(exp, p, model=model)
        paths.append(str(p))
    s = ArtifactSampler(paths)
    assert s.max_batch == 4
    assert s.pick_artifact(64, 1).spec.batch == 1
    assert s.pick_artifact(64, 2).spec.batch == 4
    assert s.pick_artifact(64, 4).spec.batch == 4
    # more than the largest batch: the largest variant (caller chunks)
    assert s.pick_artifact(64, 9).spec.batch == 4
    with pytest.raises(ValueError, match="padded_len"):
        s.pick_artifact(128, 1)


def test_http_synthesize_matches_direct_export_call(server, artifacts, ref):
    url, httpd = server
    with _post(url, {"text": "hello world", "duration": 0.5, "seed": 3}) as r:
        assert r.headers["Content-Type"] == "audio/wav"
        body = r.read()
    with wave_mod.open(io.BytesIO(body)) as w:
        assert w.getframerate() == SR
        pcm_http = np.frombuffer(w.readframes(w.getnframes()), "<i2")
    assert pcm_http.size > 0 and pcm_http.size % HOP == 0

    # replicate through the export API directly, preprocessing the reference
    # with the SAME shared helper the HTTP layer uses (serve.py's
    # resolve_ref_payload — RMS normalization of quiet references): same
    # trim, same samples
    from f5_tts_tpu.serve import resolve_ref_payload

    s = httpd.sampler
    ref_n, _ = resolve_ref_payload({}, (ref, "ref words"), SR)
    wave = s.synthesize("hello world", ref_n, "ref words",
                        int(0.5 * SR / HOP), seed=3)
    pcm_direct = (np.clip(wave, -1, 1) * 32767.0).astype("<i2")
    np.testing.assert_array_equal(pcm_http, pcm_direct)


def test_http_bucket_upgrade_and_estimate(server):
    url, _ = server
    # 1.2 s = 112 frames -> the 128 bucket
    with _post(url, {"text": "a longer utterance for the bigger bucket",
                     "duration": 1.2}) as r:
        assert r.status == 200
    # heuristic duration (no 'duration' field)
    with _post(url, {"text": "hi", "estimate_duration": True}) as r:
        assert r.status == 200


def test_http_errors(server, ref):
    url, _ = server
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(url, {"duration": 0.5})
    assert e.value.code == 400  # missing text
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(url, {"text": "way too long", "duration": 10.0})
    assert e.value.code == 400  # past the largest bucket
    # mismatched-rate reference
    buf = io.BytesIO()
    with wave_mod.open(buf, "wb") as w:
        w.setnchannels(1); w.setsampwidth(2); w.setframerate(16_000)
        w.writeframes(b"\x00\x00" * 1600)
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(url, {"text": "x", "duration": 0.5, "ref_text": "y",
                    "ref_audio_b64": base64.b64encode(buf.getvalue()).decode()})
    assert e.value.code == 400


def test_mel_only_artifact_rejected_cleanly(model, ref, tmp_path):
    exp = E.export_sampler(model, batch=1, steps=2, method="euler",
                           with_vocoder=False, embed_weights=False)
    p = tmp_path / "melonly.bin"
    E.save_sampler(exp, p, model=model)
    s = ArtifactSampler([str(p)])
    with pytest.raises(ValueError, match="mel-only"):
        s.synthesize("hi", ref, "ref words", 40)


def test_healthz_and_warmup(server):
    url, httpd = server
    httpd.sampler.warmup()  # compiles every bucket; must not error
    with urllib.request.urlopen(url + "/healthz", timeout=30) as r:
        info = json.loads(r.read())
    assert [b["padded_len"] for b in info["buckets"]] == [64, 128]
    assert all(b["steps"] == 2 for b in info["buckets"])


@pytest.fixture(scope="module")
def duration_artifact(tmp_path_factory):
    """A tiny exported duration predictor with the default audio constants
    (24 kHz / hop 256 / mel 100 — matching the sampler fixtures)."""
    from f5_tts_tpu.config import DurationConfig
    from f5_tts_tpu.models.duration import DurationPredictor

    dp = DurationPredictor.init(
        jax.random.key(7),
        DurationConfig(dim=32, depth=1, heads=2, dim_head=16, ff_mult=2,
                       text_dim=16, conv_layers=1, use_flash_attention=False),
    )
    exp = E.export_duration(dp, batch=1, padded_len=64)
    p = tmp_path_factory.mktemp("dur") / "dur.bin"
    E.save_duration(exp, p, predictor=dp)
    return str(p), dp


def test_duration_artifact_resolves_missing_duration(artifacts, ref,
                                                     duration_artifact):
    """A request with no duration routes through the exported predictor (the
    live server's predictor-by-default behavior, serve.py:_predict_durations);
    estimate_duration still forces the byte-length heuristic."""
    path, dp = duration_artifact
    s = ArtifactSampler(artifacts, duration_artifact=path)
    assert s.duration is not None

    # the frames the server derives == the live predictor over the same
    # padded window at sr // hop, speed-adjusted
    frames = s._predict_duration_frames(ref, "ref words", "hello", 1.0)
    window = s.duration.spec.padded_len
    ref_frames = ref.shape[0] // HOP
    buf = np.zeros((1, window * HOP), np.float32)
    buf[0, : ref_frames * HOP] = ref[: ref_frames * HOP]
    cond = np.array(s._mel(buf), np.float32)[:, :window]
    cond[:, ref_frames:] = 0.0
    text = s.tokenize(["ref words hello"])
    sec = float(dp(jnp.asarray(cond), jnp.asarray(text),
                   lens=jnp.array([ref_frames]))[0])
    assert frames == max(int(sec * (SR // HOP)), 1)

    # speed divides the frame count like the live path
    fast = s._predict_duration_frames(ref, "ref words", "hello", 2.0)
    assert fast == max(int(sec * (SR // HOP) / 2.0), 1)

    # synthesize(None) == synthesize(explicit predicted frames), and the
    # heuristic path is untouched under estimate=True
    w_pred = s.synthesize("hello", ref, "ref words", None, seed=5)
    w_explicit = s.synthesize("hello", ref, "ref words", frames, seed=5)
    np.testing.assert_array_equal(w_pred, w_explicit)
    from f5_tts_tpu.generate import estimated_duration

    heur = int(estimated_duration(ref, "ref words", "hello", 1.0) * (SR / HOP))
    w_heur = s.synthesize("hello", ref, "ref words", None, seed=5, estimate=True)
    w_heur2 = s.synthesize("hello", ref, "ref words", heur, seed=5)
    np.testing.assert_array_equal(w_heur, w_heur2)


def test_duration_artifact_http_and_healthz(artifacts, ref, duration_artifact):
    path, _ = duration_artifact
    httpd = serve_artifacts(artifacts, default_ref=(ref, "ref words"),
                            host="127.0.0.1", port=0, duration_artifact=path)
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    url = f"http://127.0.0.1:{httpd.server_address[1]}"
    try:
        with urllib.request.urlopen(url + "/healthz", timeout=30) as r:
            info = json.loads(r.read())
        assert info["duration_predictor"] == {"padded_len": 64}
        with _post(url, {"text": "hi", "seed": 1}) as r:  # no duration field
            assert r.status == 200 and r.read()
    finally:
        httpd.batcher.stop()
        httpd.shutdown()


def test_duration_artifact_batch_validated(artifacts, tmp_path):
    from f5_tts_tpu.config import DurationConfig
    from f5_tts_tpu.models.duration import DurationPredictor

    dp = DurationPredictor.init(
        jax.random.key(8),
        DurationConfig(dim=32, depth=1, heads=2, dim_head=16, ff_mult=2,
                       text_dim=16, conv_layers=1, use_flash_attention=False),
    )
    exp = E.export_duration(dp, batch=2, padded_len=64)
    p = tmp_path / "dur_b2.bin"
    E.save_duration(exp, p, predictor=dp)
    with pytest.raises(ValueError, match="batch=2"):
        ArtifactSampler(artifacts, duration_artifact=str(p))


def test_synthesize_stream_matches_per_sentence_synthesis(server, ref):
    """/synthesize_stream: chunked live-WAV whose PCM is exactly the
    concatenation of per-sentence synthesis at the same resolved durations,
    in order (the artifact-server counterpart of serve.py's streaming)."""
    url, httpd = server
    text = "Hi there. Also this one."
    req = urllib.request.Request(
        url + "/synthesize_stream",
        data=json.dumps({"text": text, "seed": 4}).encode(),
        headers={"Content-Type": "application/json"}, method="POST",
    )
    with urllib.request.urlopen(req, timeout=300) as r:
        assert r.headers["Content-Type"] == "audio/wav"
        body = r.read()  # urllib de-chunks
    # 44-byte live-stream header (0xFFFFFFFF sizes), then raw PCM16
    assert body[:4] == b"RIFF" and body[8:12] == b"WAVE"
    pcm_stream = np.frombuffer(body[44:], "<i2")

    from f5_tts_tpu.generate import split_sentences
    from f5_tts_tpu.serve import resolve_ref_payload

    s = httpd.sampler
    ref_n, _ = resolve_ref_payload({}, (ref, "ref words"), SR)
    parts = []
    for sent in split_sentences(text):
        frames = s.plan(sent, ref_n, "ref words", None)[0]
        wave = s.synthesize(sent, ref_n, "ref words", frames, seed=4)
        if wave.size:
            parts.append((np.clip(wave, -1, 1) * 32767.0).astype("<i2"))
    np.testing.assert_array_equal(pcm_stream, np.concatenate(parts))


def test_synthesize_stream_rejects_request_duration(server):
    url, _ = server
    req = urllib.request.Request(
        url + "/synthesize_stream",
        data=json.dumps({"text": "Hello.", "duration": 1.0}).encode(),
        headers={"Content-Type": "application/json"}, method="POST",
    )
    with pytest.raises(urllib.error.HTTPError) as e:
        urllib.request.urlopen(req, timeout=30)
    assert e.value.code == 400


def test_synthesize_stream_unservable_sentence_400s_before_commit(server):
    """A sentence no bucket can hold fails the WHOLE request with a clean 400
    (pre-planning), not a truncated 200 stream."""
    url, _ = server
    req = urllib.request.Request(
        url + "/synthesize_stream",
        data=json.dumps({"text": "Short one. " + "word " * 400 + ".",
                         "estimate_duration": True}).encode(),
        headers={"Content-Type": "application/json"}, method="POST",
    )
    with pytest.raises(urllib.error.HTTPError) as e:
        urllib.request.urlopen(req, timeout=60)
    assert e.value.code == 400


def test_clamp_aware_bucket_upgrade(artifacts):
    """A request whose REFERENCE pushes prep_inputs' duration clamp past the
    small bucket must route to the larger bucket instead of erroring: the
    bucket is picked from the clamped requirement max(duration, ref_frames+1,
    text_len+1), not the raw requested duration."""
    s = ArtifactSampler(artifacts)
    rng = np.random.default_rng(1)
    long_ref = (0.1 * rng.standard_normal(100 * HOP)).astype(np.float32)
    # raw duration 110 fits neither constraint of the 64 bucket once the
    # 100-frame reference forces lens=100 (old code picked 64 from 110>64...
    # and a 40-frame request would have picked 64 then failed in prep_inputs)
    wave = s.synthesize("hi", long_ref, "ref words", 110)
    assert wave.size == (110 - 1 - 100) * HOP  # generated region, 128 bucket

    # raw duration that FITS the small bucket but whose ref cannot: upgraded,
    # not a ValueError
    wave = s.synthesize("hi", long_ref, "ref words", 40)
    assert wave.size == 0  # duration clamped to lens+1 -> empty generated region


@pytest.fixture(scope="module")
def batched_artifacts(model, tmp_path_factory):
    """One bucket length (64 frames) in batch-1 and batch-4 variants."""
    tmp = tmp_path_factory.mktemp("batched_artifacts")
    paths = []
    for b in (1, 4):
        exp = E.export_sampler(model, batch=b, padded_len=64, steps=2,
                               method="euler", embed_weights=False)
        p = tmp / f"b{b}_64.bin"
        E.save_sampler(exp, p, model=model)
        paths.append(str(p))
    return paths


def test_concurrent_requests_batch_and_match_serial(batched_artifacts, ref):
    """N concurrent HTTP requests coalesce into ONE batch-4 device call
    (the VERDICT r4 gap: the artifact server used to be strictly serial),
    and each batched result equals the serial direct-API result."""
    httpd = serve_artifacts(batched_artifacts, default_ref=(ref, "ref words"),
                            host="127.0.0.1", port=0, max_wait_ms=500)
    sampler = httpd.sampler
    calls = []
    orig = sampler.synthesize_chunk

    def counting(art, ids, refs, durs, **kw):
        calls.append((art.spec.batch, len(ids)))
        return orig(art, ids, refs, durs, **kw)

    sampler.synthesize_chunk = counting
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    url = f"http://127.0.0.1:{httpd.server_address[1]}"
    texts = [f"hello number {i}" for i in range(4)]
    results = {}

    def post_one(i):
        with _post(url, {"text": texts[i], "duration": 0.5, "seed": 3}) as r:
            results[i] = r.read()

    try:
        threads = [threading.Thread(target=post_one, args=(i,)) for i in range(4)]
        for th in threads:
            th.start()
        for th in threads:
            th.join()
        assert sorted(results) == [0, 1, 2, 3]
        # the burst coalesced: at least one device call served >1 request
        # through the batch-4 artifact (the 500 ms gather window makes four
        # local posts land in one group deterministically)
        assert any(b == 4 and k > 1 for b, k in calls), calls
        assert len(calls) < 4, calls

        # equality with the serial direct API (which runs batches of one)
        from f5_tts_tpu.serve import resolve_ref_payload

        ref_n, _ = resolve_ref_payload({}, (ref, "ref words"), SR)
        for i in range(4):
            with wave_mod.open(io.BytesIO(results[i])) as w:
                pcm_http = np.frombuffer(w.readframes(w.getnframes()), "<i2")
            wave = sampler.synthesize(texts[i], ref_n, "ref words",
                                      int(0.5 * SR / HOP), seed=3)
            pcm_direct = (np.clip(wave, -1, 1) * 32767.0).astype("<i2")
            assert pcm_http.shape == pcm_direct.shape
            # batch-4 vs batch-1 programs: same math per item (masked
            # attention/cond), allow 1 LSB for any fused-reduction wiggle
            np.testing.assert_allclose(
                pcm_http.astype(np.int32), pcm_direct.astype(np.int32), atol=1
            )
    finally:
        httpd.batcher.stop()
        httpd.shutdown()


def test_stream_sentences_batch_through_backfill_group(batched_artifacts, ref):
    """A 3-sentence stream: sentence 0 runs as its own rank-0 group
    (time-to-first-audio), the backfill sentences share device calls."""
    httpd = serve_artifacts(batched_artifacts, default_ref=(ref, "ref words"),
                            host="127.0.0.1", port=0, max_wait_ms=200)
    sampler = httpd.sampler
    calls = []
    orig = sampler.synthesize_chunk

    def counting(art, ids, refs, durs, **kw):
        calls.append((art.spec.batch, len(ids)))
        return orig(art, ids, refs, durs, **kw)

    sampler.synthesize_chunk = counting
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    url = f"http://127.0.0.1:{httpd.server_address[1]}"
    req = urllib.request.Request(
        url + "/synthesize_stream",
        data=json.dumps({"text": "One two. Three four. Five six.",
                         "estimate_duration": True, "seed": 1}).encode(),
        headers={"Content-Type": "application/json"}, method="POST",
    )
    try:
        with urllib.request.urlopen(req, timeout=300) as r:
            assert r.headers.get("Transfer-Encoding") == "chunked"
            body = r.read()
        assert len(body) > 44  # header + PCM
        # 3 sentences, but fewer device calls: the rank-1 backfill batched
        assert len(calls) == 2, calls
        assert calls[0][1] == 1 and calls[1][1] == 2, calls
    finally:
        httpd.batcher.stop()
        httpd.shutdown()


def test_unservable_direct_request_fails_without_killing_batcher(
        artifacts, ref):
    """A directly-submitted request (library caller, no HTTP pre-planning)
    whose explicit duration exceeds every exported bucket must fail its OWN
    future — and the batcher thread must survive to serve the next request.
    Regression: _group_key used to leave bucket_len=None in the scheduler
    key, and the base scheduler's cost arithmetic (key[5]*key[0]) raised
    TypeError out of the batcher thread, hanging every later request."""
    from f5_tts_tpu.artifact_serve import ArtifactBatcher
    from f5_tts_tpu.serve import _Request

    sampler = ArtifactSampler(artifacts)
    batcher = ArtifactBatcher(sampler, max_wait_ms=10.0)
    batcher.start()
    try:
        bad = _Request(
            text="too long", ref_audio=ref, ref_text="ref words",
            duration_frames=10_000,  # no bucket holds this
            steps=2, method="euler", cfg_strength=2.0, sway=-1.0, seed=0,
        )
        fut = batcher.submit(bad)
        with pytest.raises(ValueError):
            fut.result(timeout=60)

        good = _Request(
            text="short", ref_audio=ref, ref_text="ref words",
            duration_frames=40, steps=2, method="euler",
            cfg_strength=2.0, sway=-1.0, seed=0,
        )
        wave = batcher.submit(good).result(timeout=60)
        assert wave.ndim == 1 and wave.size > 0
    finally:
        batcher.stop()


def test_cancelled_requests_never_reach_device(artifacts, ref):
    """Cancelling queued futures stops their synthesis: the scheduler drops
    settled futures before grouping and _run_group re-filters at dispatch.
    This is the contract the stream handler relies on when a mid-stream
    failure cancels the sentences still queued for a dead connection."""
    from f5_tts_tpu.artifact_serve import ArtifactBatcher
    from f5_tts_tpu.serve import _Request

    sampler = ArtifactSampler(artifacts)
    calls = []
    orig = sampler.synthesize_chunk

    def counting(art, ids, refs, durs, **kw):
        calls.append(len(ids))
        return orig(art, ids, refs, durs, **kw)

    sampler.synthesize_chunk = counting
    batcher = ArtifactBatcher(sampler, max_wait_ms=500.0)
    batcher.start()
    try:
        reqs = [
            _Request(text=f"t {i}", ref_audio=ref, ref_text="ref words",
                     duration_frames=40, steps=2, method="euler",
                     cfg_strength=2.0, sway=-1.0, seed=0)
            for i in range(3)
        ]
        futs = [batcher.submit(r) for r in reqs]
        # cancel two while all three sit in the 500 ms gather window (skip
        # rather than flake if a starved box let the batcher win the race)
        if not (futs[1].cancel() and futs[2].cancel()):
            pytest.skip("batcher dispatched before cancel (loaded host)")
        wave = futs[0].result(timeout=60)
        assert wave.ndim == 1
        # only the live request reached the device (batch-1 artifacts: one
        # chunk per surviving request)
        assert sum(calls) == 1, calls
    finally:
        batcher.stop()
