"""Online serving daemon tests: continuous microbatching (deadline + size
windows, param isolation, seeded-solo semantics), HTTP surface, and LoRA
hot-load into a running engine. All over the tiny serve fixtures."""

import base64
import io
import json
import threading
import urllib.request
import wave

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from audioldm_tpu.config import DDIMConfig, LoRAConfig
from audioldm_tpu.lora import init_lora
from audioldm_tpu.pipeline.generate import random_modules
from audioldm_tpu.serve import AdapterBank, GenParams, Microbatcher, ServeEngine, make_server
from tests.test_pipeline import TINY_TEXT, TINY_UNET, TINY_VAE, TINY_VOC
from tests.test_serve import DummyTokenizer

PARAMS = GenParams(num_inference_steps=2, audio_length_in_s=0.01, guidance_scale=2.0)


def _make_engine(with_bank=True):
    modules = random_modules(
        jax.random.PRNGKey(0),
        unet_cfg=TINY_UNET, vae_cfg=TINY_VAE, text_cfg=TINY_TEXT, vocoder_cfg=TINY_VOC,
        ddim_cfg=DDIMConfig(),
    )
    lcfg = LoRAConfig(r=2, lora_alpha=4)
    bank = None
    if with_bank:
        a1 = init_lora(jax.random.PRNGKey(1), modules.unet, lcfg)
        a1 = jax.tree.map(lambda x: x + 0.05, a1)
        bank = AdapterBank.from_adapters({"hiphop": a1}, lcfg)
    return ServeEngine(modules, DummyTokenizer(), lcfg, bank=bank, dtype=jnp.float32,
                       bucket_sizes=(1, 2, 4))


@pytest.fixture(scope="module")
def engine():
    return _make_engine()


def test_batch_forms_on_max_batch(engine):
    """Three concurrent unseeded requests with a long window must be served
    as ONE batch once max_batch=3 fills, and each row must equal the direct
    engine call for the same batch + the batcher's batch-0 seed."""
    mb = Microbatcher(engine, max_batch=3, max_delay_ms=10_000.0, base_seed=7)
    try:
        prompts = ["hip hop beat", "smooth jazz", "rain sounds"]
        futs = [mb.submit(p, params=PARAMS) for p in prompts]
        wavs = np.stack([f.result(timeout=120) for f in futs])
        assert mb.batch_sizes == [3]
        # batch 0's rng is fold_in(PRNGKey(base_seed), 0) — NOT PRNGKey(7):
        # a raw small-int batch key would collide with a request seeded 7
        # (Microbatcher._batch_rng)
        direct = engine.generate(
            prompts, adapters=[None] * 3, num_inference_steps=2,
            audio_length_in_s=0.01, guidance_scale=2.0, rng_key=mb._batch_rng(0),
        )
        np.testing.assert_allclose(wavs, direct, atol=1e-6)
    finally:
        mb.close()


def test_deadline_closes_underfull_batch(engine):
    """A single request must complete after ~max_delay_ms without waiting
    for the batch to fill."""
    mb = Microbatcher(engine, max_batch=8, max_delay_ms=30.0)
    try:
        wav = mb.submit("hip hop beat", params=PARAMS).result(timeout=120)
        assert wav.shape == (160,)
        assert mb.batch_sizes == [1]
    finally:
        mb.close()


def test_param_groups_never_share_a_batch(engine):
    """Different generation params are different compile keys: 2+1 requests
    split into a params-A batch and a params-B batch."""
    other = GenParams(num_inference_steps=3, audio_length_in_s=0.01, guidance_scale=2.0)
    # window long enough that co-arriving same-key requests always share,
    # short enough that the odd-key request's deadline flush is quick
    mb = Microbatcher(engine, max_batch=2, max_delay_ms=500.0)
    try:
        fa = [mb.submit("hip hop beat", params=PARAMS), mb.submit("jazz", params=PARAMS)]
        fb = mb.submit("rain", params=other)
        for f in fa + [fb]:
            f.result(timeout=120)
        assert sorted(mb.batch_sizes) == [1, 2]
    finally:
        mb.close()


def test_seeded_request_batches_and_reproduces(engine):
    """An explicit seed pins the exact waveform independent of co-arriving
    traffic — WITHOUT a solo batch (VERDICT round-3 #6): the seeded request
    shares its batch with unseeded peers and still matches
    engine.generate([prompt], seed=s): identical latents, waveform equal
    to float-fusion tolerance (the solo call compiles a batch-1 program)."""
    mb = Microbatcher(engine, max_batch=2, max_delay_ms=10_000.0, base_seed=7)
    try:
        f_seeded = mb.submit("hip hop beat", params=PARAMS, seed=123)
        f_plain = mb.submit("smooth jazz", params=PARAMS)
        wav = f_seeded.result(timeout=120)
        assert f_plain.result(timeout=120).shape == (160,)
        assert mb.batch_sizes == [2]  # seeded traffic no longer serializes
        solo = engine.generate(["hip hop beat"], num_inference_steps=2,
                               audio_length_in_s=0.01, guidance_scale=2.0, seed=123)
        np.testing.assert_allclose(wav, solo[0], atol=1e-6)
    finally:
        mb.close()


def test_seeded_lcm_is_solo(engine):
    """lcm draws inter-step noise from the BATCH rng, so a seeded lcm
    request is the one remaining solo case; unseeded lcm still batches."""
    lcm = GenParams(num_inference_steps=2, audio_length_in_s=0.01,
                    guidance_scale=2.0, scheduler="lcm")
    mb = Microbatcher(engine, max_batch=2, max_delay_ms=10_000.0, base_seed=7)
    try:
        f_seeded = mb.submit("hip hop beat", params=lcm, seed=123)
        f_plain = mb.submit("smooth jazz", params=lcm)
        wav = f_seeded.result(timeout=180)
        mb.close()  # drain the unseeded one
        assert f_plain.result(timeout=120).shape == (160,)
        assert 1 in mb.batch_sizes  # the seeded lcm went out alone
        solo = engine.generate(["hip hop beat"], num_inference_steps=2,
                               audio_length_in_s=0.01, guidance_scale=2.0,
                               seed=123, scheduler="lcm")
        np.testing.assert_array_equal(wav, solo[0])
    finally:
        mb.close()


def test_unknown_adapter_fails_fast(engine):
    mb = Microbatcher(engine, max_batch=2, max_delay_ms=20.0)
    try:
        with pytest.raises(KeyError, match="unknown adapter"):
            mb.submit("beat", adapter="nope", params=PARAMS)
    finally:
        mb.close()


def _post(url, payload):
    req = urllib.request.Request(
        url, data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"}, method="POST",
    )
    try:
        with urllib.request.urlopen(req, timeout=180) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def _get(url):
    with urllib.request.urlopen(url, timeout=30) as r:
        return r.status, json.loads(r.read())


@pytest.fixture()
def server(engine, tmp_path):
    mb = Microbatcher(engine, max_batch=2, max_delay_ms=30.0)
    srv = make_server(mb, sample_rate=16000, port=0)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    base = f"http://127.0.0.1:{srv.server_address[1]}"
    yield base, mb
    srv.shutdown()
    srv.server_close()
    mb.close()


def test_http_generate_and_health(server, engine):
    base, mb = server
    assert _get(base + "/healthz") == (200, {"ok": True})

    code, resp = _post(base + "/v1/generate", {
        "prompt": "hip hop beat", "steps": 2, "seconds": 0.01,
        "guidance": 2.0, "seed": 5,
    })
    assert code == 200
    assert resp["sample_rate"] == 16000 and resp["samples"] == 160
    with wave.open(io.BytesIO(base64.b64decode(resp["audio_b64"]))) as w:
        assert w.getframerate() == 16000 and w.getnframes() == 160
        pcm = np.frombuffer(w.readframes(160), "<i2").astype(np.float32) / 32767.0
    direct = engine.generate(["hip hop beat"], num_inference_steps=2,
                             audio_length_in_s=0.01, guidance_scale=2.0, seed=5)
    np.testing.assert_allclose(pcm, np.clip(direct[0], -1, 1), atol=1.0 / 32767.0)

    code, stats = _get(base + "/v1/stats")
    assert code == 200 and stats["served"] >= 1

    code, resp = _post(base + "/v1/generate", {"steps": 2})
    assert code == 400 and "prompt" in resp["error"]
    code, resp = _post(base + "/v1/generate",
                       {"prompt": "x", "adapter": "nope", "steps": 2, "seconds": 0.01})
    assert code == 400 and "unknown adapter" in resp["error"]


def test_http_concurrent_requests_batch(server):
    base, mb = server
    results = {}

    def call(i):
        results[i] = _post(base + "/v1/generate", {
            "prompt": f"beat {i}", "steps": 2, "seconds": 0.01, "guidance": 2.0,
        })

    threads = [threading.Thread(target=call, args=(i,)) for i in range(2)]
    before = len(mb.batch_sizes)
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=180)
    assert all(results[i][0] == 200 for i in range(2))
    # both served; with max_batch=2 and a shared window they normally ride
    # one batch, but scheduling may split them — only assert completion + count
    assert sum(mb.batch_sizes[before:]) == 2


def test_hot_load_adapter_http(tmp_path):
    """POST /v1/adapters loads a PEFT safetensors into a bank-less running
    engine; subsequent generations with that adapter differ from base and
    match a merged-offline engine."""
    from safetensors.numpy import save_file

    from audioldm_tpu.lora import export_peft_state_dict

    engine = _make_engine(with_bank=False)
    lcfg = LoRAConfig(r=2, lora_alpha=2)
    lora = init_lora(jax.random.PRNGKey(9), engine.modules.unet, lcfg)
    lora = jax.tree.map(lambda x: x + 0.08, lora)
    path = str(tmp_path / "model.safetensors")
    save_file({k: np.asarray(v) for k, v in export_peft_state_dict(lora).items()}, path)

    mb = Microbatcher(engine, max_batch=1, max_delay_ms=10.0)
    srv = make_server(mb, sample_rate=16000, port=0)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    base = f"http://127.0.0.1:{srv.server_address[1]}"
    try:
        code, resp = _post(base + "/v1/generate",
                           {"prompt": "x", "adapter": "funk", "steps": 2, "seconds": 0.01})
        assert code == 400  # not loaded yet

        code, resp = _post(base + "/v1/adapters", {"name": "funk", "path": path})
        assert code == 200 and resp == {"loaded": "funk", "rank": 2,
                                        "adapters": ["base", "funk"]}

        gen = {"prompt": "hip hop beat", "steps": 2, "seconds": 0.01,
               "guidance": 2.0, "seed": 3}
        code, with_lora = _post(base + "/v1/generate", {**gen, "adapter": "funk"})
        assert code == 200
        code, plain = _post(base + "/v1/generate", gen)
        assert code == 200
        assert with_lora["audio_b64"] != plain["audio_b64"]

        # bad path and rank mismatch are 400s, not 500s
        code, resp = _post(base + "/v1/adapters", {"name": "x", "path": "/nope.safetensors"})
        assert code == 400
    finally:
        srv.shutdown()
        srv.server_close()
        mb.close()


def test_load_adapter_replace_invalidates_merged_cache(engine):
    """Replacing an adapter in-place updates the bank row and drops its
    merged-cache entry, so the next uniform batch re-merges."""
    mb = Microbatcher(engine, max_batch=1, max_delay_ms=10.0)
    try:
        f1 = mb.submit("hip hop beat", adapter="hiphop", params=PARAMS, seed=1)
        w1 = f1.result(timeout=120)
        assert "hiphop" in engine._merged_cache
        lcfg = LoRAConfig(r=2, lora_alpha=4)
        newt = init_lora(jax.random.PRNGKey(42), engine.modules.unet, lcfg)
        newt = jax.tree.map(lambda x: x + 0.2, newt)
        mb.load_adapter("hiphop", newt, rank=2)
        assert "hiphop" not in engine._merged_cache
        w2 = mb.submit("hip hop beat", adapter="hiphop", params=PARAMS, seed=1).result(timeout=120)
        assert np.max(np.abs(w1 - w2)) > 1e-6
        with pytest.raises(ValueError, match="rank"):
            mb.load_adapter("other", newt, rank=4)
    finally:
        mb.close()


def test_http_compose_adapter_and_generate(server):
    """POST /v1/adapters with a 'compose' map registers a weighted
    composition servable by name; output equals the engine's direct
    composed-adapter seeded-solo call."""
    base, mb = server
    code, resp = _post(base + "/v1/adapters", {
        "name": "blend", "compose": {"hiphop": 0.6},
    })
    assert code == 200 and resp["composed"] == "blend"
    assert "blend" in resp["composed_all"]
    code, listing = _get(base + "/v1/adapters")
    assert code == 200 and "blend" in listing["composed"]

    code, resp = _post(base + "/v1/generate", {
        "prompt": "hip hop beat", "adapter": "blend", "steps": 2,
        "seconds": 0.01, "guidance": 2.0, "seed": 3,
    })
    assert code == 200, resp
    with wave.open(io.BytesIO(base64.b64decode(resp["audio_b64"]))) as w:
        got = np.frombuffer(w.readframes(w.getnframes()), "<i2").astype(np.float32) / 32767.0
    direct = mb.engine.generate(
        ["hip hop beat"], adapters=["blend"], num_inference_steps=2,
        audio_length_in_s=0.01, guidance_scale=2.0, seed=3,
    )
    np.testing.assert_allclose(got, np.clip(direct[0], -1, 1), atol=1.0 / 32767.0)

    # composing from an unknown component is a 400, not a crash
    code, resp = _post(base + "/v1/adapters", {"name": "bad", "compose": {"ghost": 1.0}})
    assert code == 400 and "cannot compose" in resp["error"]
    # need exactly one of path/compose
    code, resp = _post(base + "/v1/adapters", {"name": "bad"})
    assert code == 400


def test_http_negative_prompt_isolation(server):
    """Requests with different negative prompts never share a batch, and the
    negative prompt actually reaches the engine (different output)."""
    base, mb = server
    body = {"prompt": "hip hop beat", "steps": 2, "seconds": 0.01,
            "guidance": 2.0, "seed": 11}
    _, r_default = _post(base + "/v1/generate", body)
    _, r_neg = _post(base + "/v1/generate", {**body, "negative_prompt": "low quality"})
    assert r_default["audio_b64"] != r_neg["audio_b64"]
    # grouping: two concurrent submits with different negs form two batches
    p_a = GenParams(2, 0.01, 2.0, "ddim", None)
    p_b = GenParams(2, 0.01, 2.0, "ddim", "noisy")
    n0 = len(mb.batch_sizes)
    futs = [mb.submit("beat", params=p_a), mb.submit("beat", params=p_b)]
    for f in futs:
        f.result(timeout=120)
    assert len(mb.batch_sizes) == n0 + 2


def test_stats_latency_percentiles(engine):
    mb = Microbatcher(engine, max_batch=2, max_delay_ms=10.0)
    try:
        assert mb.stats()["latency_ms"] is None
        mb.submit("beat", params=PARAMS).result(timeout=120)
        s = mb.stats()
        assert s["latency_ms"]["p50"] > 0
        assert s["latency_ms"]["p99"] >= s["latency_ms"]["p50"]
    finally:
        mb.close()


def test_component_reload_refreshes_compositions():
    """Hot-loading a component adapter recomputes compositions built from it
    (they would otherwise serve stale merged weights) and composed names are
    protected from being overwritten by loads."""
    eng = _make_engine()
    mb = Microbatcher(eng, max_batch=2, max_delay_ms=20.0)
    try:
        eng.add_composed("blend", {"hiphop": 1.0})
        out1 = mb.submit("beat", adapter="blend", params=PARAMS, seed=9).result(timeout=180)
        new_tree = jax.tree.map(
            lambda x: x - 0.03,
            init_lora(jax.random.PRNGKey(7), eng.modules.unet, eng.lora_cfg),
        )
        mb.load_adapter("hiphop", new_tree, rank=2, alpha=4)
        out2 = mb.submit("beat", adapter="blend", params=PARAMS, seed=9).result(timeout=180)
        assert np.max(np.abs(out1 - out2)) > 1e-7
        # blend = 1.0 * hiphop, so post-refresh it equals the NEW component
        direct = eng.generate(["beat"], adapters=["hiphop"], num_inference_steps=2,
                              audio_length_in_s=0.01, guidance_scale=2.0, seed=9)
        np.testing.assert_allclose(out2, direct[0], atol=1e-6)
        with pytest.raises(ValueError, match="taken by a composed"):
            mb.load_adapter("blend", new_tree, rank=2, alpha=4)
    finally:
        mb.close()


def test_unservable_combination_fails_solo_not_batch():
    """An unservable adapter COMBINATION (composed name forced onto the
    rank-r path) must not poison co-batched requests: the batch retries
    solo, where both requests are uniform and succeed."""
    eng = _make_engine()
    eng.split_mixed_adapters = False  # forces mixed batches onto rank-r
    eng.add_composed("blend", {"hiphop": 1.0})
    mb = Microbatcher(eng, max_batch=2, max_delay_ms=10_000.0)
    try:
        f1 = mb.submit("a", adapter="blend", params=PARAMS)
        f2 = mb.submit("b", adapter="base", params=PARAMS)
        assert f1.result(timeout=180).shape == (160,)
        assert f2.result(timeout=180).shape == (160,)
        assert 2 in mb.batch_sizes or mb.batch_sizes.count(1) >= 2
    finally:
        mb.close()


def _delete(url):
    req = urllib.request.Request(url, method="DELETE")
    try:
        with urllib.request.urlopen(req, timeout=30) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def test_http_delete_adapter():
    """DELETE /v1/adapters/<name> unloads a bank adapter; deleting a
    composition component is a 409 until the composition goes first;
    unknown names are 404 (VERDICT round-3 #7). Private engine — the
    deletes must not poison the shared module fixture."""
    mb = Microbatcher(_make_engine(), max_batch=1, max_delay_ms=10.0)
    srv = make_server(mb, sample_rate=16000, port=0)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    base = f"http://127.0.0.1:{srv.server_address[1]}"
    try:
        code, resp = _post(base + "/v1/adapters",
                           {"name": "mix", "compose": {"hiphop": 1.0}})
        assert code == 200
        code, resp = _delete(base + "/v1/adapters/hiphop")
        assert code == 409 and "component" in resp["error"]
        code, resp = _delete(base + "/v1/adapters/mix")
        assert code == 200 and resp["removed"] == "mix"
        code, resp = _delete(base + "/v1/adapters/hiphop")
        assert code == 200 and resp["adapters"] == ["base"]
        code, resp = _post(base + "/v1/generate",
                           {"prompt": "x", "adapter": "hiphop", "steps": 2, "seconds": 0.01})
        assert code == 400  # gone: serving it fails fast, not silently on base
        code, resp = _delete(base + "/v1/adapters/hiphop")
        assert code == 404
        code, resp = _delete(base + "/v1/adapters/")
        assert code == 404
    finally:
        srv.shutdown()
        srv.server_close()
        mb.close()


def test_lru_eviction_at_max_adapters():
    """Loading a NEW adapter past max_adapters evicts the least-recently-
    served one; composition components are never evicted."""
    eng = _make_engine(with_bank=True)  # starts with 'hiphop'
    lcfg = eng.lora_cfg
    mk = lambda s: jax.tree.map(lambda x: x + 0.01 * s,
                                init_lora(jax.random.PRNGKey(s), eng.modules.unet, lcfg))
    mb = Microbatcher(eng, max_batch=1, max_delay_ms=10.0, max_adapters=2)
    try:
        mb.load_adapter("jazz", mk(2), lcfg.r)
        assert sorted(eng.bank.names) == ["base", "hiphop", "jazz"]
        # hiphop was pre-loaded at engine construction (no usage stamp ->
        # treated as least recent); jazz is load-stamped -> hiphop is evicted
        mb.load_adapter("funk", mk(3), lcfg.r)
        assert sorted(eng.bank.names) == ["base", "funk", "jazz"]
        # replacing an EXISTING name never evicts
        mb.load_adapter("jazz", mk(4), lcfg.r)
        assert sorted(eng.bank.names) == ["base", "funk", "jazz"]
        # a composition pins its components: with both slots pinned the
        # load is refused rather than breaking a composition
        mb.compose_adapter("mix", {"jazz": 0.5, "funk": 0.5})
        with pytest.raises(ValueError, match="composition component"):
            mb.load_adapter("rock", mk(5), lcfg.r)
    finally:
        mb.close()


def test_http_guidance_interval(server, engine):
    """guidance_interval rides the HTTP body as [lo, hi]; malformed values
    are a clean 400, and the served waveform matches a direct engine call
    with the same interval."""
    base, mb = server
    code, resp = _post(base + "/v1/generate", {
        "prompt": "hip hop beat", "steps": 2, "seconds": 0.01,
        "guidance": 2.0, "seed": 5, "guidance_interval": [0.0, 0.3],
    })
    assert code == 200
    with wave.open(io.BytesIO(base64.b64decode(resp["audio_b64"]))) as w:
        pcm = np.frombuffer(w.readframes(w.getnframes()), "<i2").astype(np.float32) / 32767.0
    direct = engine.generate(["hip hop beat"], num_inference_steps=2,
                             audio_length_in_s=0.01, guidance_scale=2.0, seed=5,
                             guidance_interval=(0.0, 0.3))
    np.testing.assert_allclose(pcm, np.clip(direct[0], -1, 1), atol=1.0 / 32767.0)

    code, resp = _post(base + "/v1/generate", {
        "prompt": "x", "steps": 2, "seconds": 0.01, "guidance_interval": [0.9, 0.1],
    })
    assert code == 400 and "guidance_interval" in resp["error"]
    code, resp = _post(base + "/v1/generate", {
        "prompt": "x", "steps": 2, "seconds": 0.01, "guidance_interval": "bad",
    })
    assert code == 400 and "guidance_interval" in resp["error"]
    # a 2-char numeric STRING is iterable — "01" must not silently pass as
    # (0.0, 1.0) (code-review finding)
    code, resp = _post(base + "/v1/generate", {
        "prompt": "x", "steps": 2, "seconds": 0.01, "guidance_interval": "01",
    })
    assert code == 400 and "guidance_interval" in resp["error"]
    code, resp = _post(base + "/v1/generate", {
        "prompt": "x", "steps": 2, "seconds": 0.01, "guidance_interval": [0.1, 0.5, 0.9],
    })
    assert code == 400 and "guidance_interval" in resp["error"]


def test_inflight_adapter_pinned_against_eviction_and_delete():
    """An adapter referenced by an accepted-but-unserved request must not be
    LRU-evicted or DELETEd out from under it — the request was validated at
    submit time and would otherwise 500 at serve time (code-review finding).
    The pin lifts once the request's future resolves."""
    eng = _make_engine()  # bank: hiphop
    a2 = jax.tree.map(lambda x: x + 0.02,
                      init_lora(jax.random.PRNGKey(5), eng.modules.unet, eng.lora_cfg))
    mb = Microbatcher(eng, max_batch=8, max_delay_ms=10_000.0, max_adapters=1)
    try:
        fut = mb.submit("beat", adapter="hiphop", params=PARAMS)
        # the request sits in the batching window (max_batch 8, long delay):
        # hiphop is pinned — direct removal and evicting loads are refused
        with pytest.raises(ValueError, match="in-flight"):
            mb.remove_adapter("hiphop")
        with pytest.raises(ValueError, match="pinned"):
            mb.load_adapter("funk", a2, rank=2, alpha=4)
        assert eng.has_adapter("hiphop")
        mb.close()  # drains the queue — the pinned request serves
        assert fut.result(timeout=180).shape == (160,)
        # pin lifted: the same load now LRU-evicts hiphop (max_adapters=1)
        mb.load_adapter("funk", a2, rank=2, alpha=4)
        assert eng.has_adapter("funk") and not eng.has_adapter("hiphop")
    finally:
        mb.close()


def test_batch_rng_leaves_prngkey_family(engine):
    """The unseeded batch rng is fold_in(PRNGKey(base_seed), ordinal), never
    a raw PRNGKey(k): a raw small-int batch key would make unseeded row 0
    (fold_in(rng, 0)) bit-identical to a request seeded with that same small
    k — two unrelated requests served the same waveform (code-review
    finding). Check the first batch ordinals against the small-seed family."""
    mb = Microbatcher(engine, max_batch=1, max_delay_ms=1.0, base_seed=0)
    try:
        raw = {tuple(np.asarray(jax.random.PRNGKey(k)).tolist()) for k in range(512)}
        seeded_row0 = {
            tuple(np.asarray(jax.random.fold_in(jax.random.PRNGKey(k), 0)).tolist())
            for k in range(512)
        }
        for ordinal in range(16):
            bk = mb._batch_rng(ordinal)
            assert tuple(np.asarray(bk).tolist()) not in raw
            row0 = jax.random.fold_in(bk, 0)
            assert tuple(np.asarray(row0).tolist()) not in seeded_row0
    finally:
        mb.close()


def test_geometry_allowlist(engine):
    """With a geometry allowlist, submit rejects any GenParams whose
    compile-key tuple is not listed (VERDICT round-4 #5: a stray request
    must not trigger a minutes-long serve-path compile or an HBM-OOM
    worker crash); negative_prompt is a grouping field, not a compile key,
    so it rides an allowed geometry."""
    mb = Microbatcher(engine, max_batch=2, max_delay_ms=30.0, geometries=[PARAMS])
    try:
        # allowed geometry serves normally
        wav = mb.submit("hip hop beat", params=PARAMS).result(timeout=120)
        assert wav.shape == (160,)
        # same geometry + negative prompt: still allowed (grouping field)
        import dataclasses
        neg = dataclasses.replace(PARAMS, negative_prompt="noise")
        assert mb.submit("beat", params=neg).result(timeout=120).shape == (160,)
        # a dangling window_overlap with windowing OFF selects the SAME
        # compiled program (the engine ignores it), so it must match the
        # allowed geometry (round-5 review finding: geometry() normalizes
        # the overlap slot to None when window_seconds is None)
        dangling = dataclasses.replace(PARAMS, window_overlap=0.9)
        assert mb.submit("beat", params=dangling).result(timeout=120).shape == (160,)
        # different steps / seconds / scheduler: all rejected at submit
        for bad in (
            dataclasses.replace(PARAMS, num_inference_steps=3),
            dataclasses.replace(PARAMS, audio_length_in_s=30.0),
            dataclasses.replace(PARAMS, scheduler="dpm++"),
            dataclasses.replace(PARAMS, window_seconds=5.0),
            dataclasses.replace(PARAMS, guidance_interval=(0.1, 0.5)),
        ):
            with pytest.raises(ValueError, match="allowlist"):
                mb.submit("beat", params=bad)
    finally:
        mb.close()


def test_geometry_allowlist_mixed_optional_fields():
    """A multi-entry allowlist whose tuples mix None with floats/tuples in
    the same slot (ddim50 + guidance-interval — exactly the pair the bench
    tracks) must still produce the 400-path ValueError on rejection, not a
    TypeError from sorting heterogeneous tuples (round-5 review finding:
    plain sorted() raised and the handler turned it into a 500)."""
    import dataclasses

    from audioldm_tpu.serve.daemon import Microbatcher

    class _NoEngine:  # submit validates the geometry BEFORE touching the engine
        bank = None
        composed = {}

        def has_adapter(self, name):
            return True

    mb = Microbatcher(_NoEngine(), max_batch=2, geometries=[
        PARAMS,
        dataclasses.replace(PARAMS, guidance_interval=(0.05, 0.65)),
        dataclasses.replace(PARAMS, window_seconds=0.005, window_overlap=0.25),
    ])
    try:
        with pytest.raises(ValueError, match="allowlist"):
            mb.submit("beat", params=dataclasses.replace(PARAMS, num_inference_steps=7))
    finally:
        mb.close()


def test_http_geometry_allowlist(engine):
    """HTTP surface: a request outside the allowlist gets a 400 with the
    allowed geometries in the error, never a 500 or a compile."""
    mb = Microbatcher(engine, max_batch=2, max_delay_ms=30.0, geometries=[PARAMS])
    srv = make_server(mb, sample_rate=16000, port=0)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    base = f"http://127.0.0.1:{srv.server_address[1]}"
    try:
        code, resp = _post(base + "/v1/generate", {
            "prompt": "hip hop beat", "steps": 2, "seconds": 0.01, "guidance": 2.0,
        })
        assert code == 200
        code, resp = _post(base + "/v1/generate", {
            "prompt": "hip hop beat", "steps": 50, "seconds": 120.0,
        })
        assert code == 400 and "allowlist" in resp["error"]
        code, resp = _post(base + "/v1/generate", {
            "prompt": "hip hop beat", "steps": 2, "seconds": 0.01, "guidance": 2.0,
            "scheduler": "dpm++",
        })
        assert code == 400 and "allowlist" in resp["error"]
    finally:
        srv.shutdown()
        srv.server_close()
        mb.close()


def test_http_bad_typed_fields_400(server):
    """Malformed field TYPES must be a 400 with a body, not an unhandled
    exception that drops the connection with no response (round-5 review
    finding: the int()/float() coercions ran outside the try block)."""
    base, _ = server
    for body in (
        {"prompt": "x", "steps": "fast"},
        {"prompt": "x", "seconds": [10]},
        {"prompt": "x", "guidance": "high"},
        {"prompt": "x", "window_overlap": "half"},
        {"prompt": "x", "seed": "abc"},
    ):
        code, resp = _post(base + "/v1/generate", body)
        assert code == 400, body
        assert "bad parameter" in resp["error"], resp


def test_http_defaults_fill_from_server(engine):
    """Fields absent from the body take the SERVER-configured defaults
    (Microbatcher.defaults), so an operator serving non-default flags with
    `--geometry default` serves bare requests instead of 400ing every one
    (round-5 review finding). Explicit JSON null counts as absent."""
    mb = Microbatcher(engine, max_batch=2, max_delay_ms=30.0,
                      geometries=[PARAMS], defaults=PARAMS)
    srv = make_server(mb, sample_rate=16000, port=0)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    base = f"http://127.0.0.1:{srv.server_address[1]}"
    try:
        # bare request: every geometry field filled from defaults -> allowed
        code, resp = _post(base + "/v1/generate", {"prompt": "hip hop beat"})
        assert code == 200 and resp["samples"] == 160
        # explicit null = absent, NOT "override with dataclass default"
        code, resp = _post(base + "/v1/generate",
                           {"prompt": "hip hop beat", "steps": None, "seconds": None})
        assert code == 200
        # a present field still overrides the default (and here leaves the
        # allowlist -> 400)
        code, resp = _post(base + "/v1/generate", {"prompt": "x", "steps": 3})
        assert code == 400 and "allowlist" in resp["error"]
    finally:
        srv.shutdown()
        srv.server_close()
        mb.close()


def test_geometry_allowlist_raw_tuple_normalized(engine):
    """Raw-tuple allowlist entries get the same normalization as
    GenParams.geometry(): a dangling window_overlap with windowing off is
    coerced to None so the entry is matchable, and a wrong-arity tuple is
    rejected at construction instead of becoming dead config (round-5
    review finding)."""
    raw = (2, 0.01, 2.0, "ddim", None, 0.5, None)  # dangling overlap slot
    mb = Microbatcher(engine, max_batch=2, max_delay_ms=30.0, geometries=[raw])
    try:
        # PARAMS.geometry() normalizes its overlap slot to None; the raw
        # entry above must have been normalized identically to match
        wav = mb.submit("hip hop beat", params=PARAMS).result(timeout=120)
        assert wav.shape == (160,)
    finally:
        mb.close()
    with pytest.raises(ValueError, match="fields"):
        Microbatcher(engine, max_batch=2, geometries=[(2, 0.01, 2.0)])


def test_http_non_dict_body_400(server):
    """Valid JSON that is not an object (`5`, `null`, a bare string) must be
    a 400 with a body — `in`/`.get` on a non-dict used to raise in the
    handler thread and drop the connection with no response (round-5 review
    finding). The bare-string case is the nastiest: `"a prompt"` contains
    the substring 'prompt', so `"prompt" in body` passed and the crash
    moved to `.get`."""
    base, _ = server
    for body in (5, None, "a prompt", [1, 2]):
        code, resp = _post(base + "/v1/generate", body)
        assert code == 400, body
        assert "JSON object" in resp["error"], resp
        code, resp = _post(base + "/v1/adapters", body)
        assert code == 400, body


def test_http_invalid_param_combos_400(server):
    """Parameter combinations the PIPELINE would reject at trace time are
    400s at parse time (GenParams.validate), never server-side exceptions
    inside the batch thread: a blanket result-time ValueError->400 would
    reclassify genuine server bugs as client errors, so the handler now
    maps result-time errors to 500 and relies on this pre-validation for
    the client-fault cases (round-5 review finding)."""
    base, _ = server
    for body, frag in (
        ({"prompt": "x", "scheduler": "fast"}, "scheduler"),
        ({"prompt": "x", "steps": 0}, "steps"),
        ({"prompt": "x", "seconds": 0}, "seconds"),
        ({"prompt": "x", "steps": 2, "seconds": 0.01, "scheduler": "lcm",
          "guidance_interval": [0.1, 0.5]}, "lcm"),
        ({"prompt": "x", "steps": 2, "seconds": 0.01, "window_seconds": 0.005,
          "guidance_interval": [0.1, 0.5]}, "windowed"),
        ({"prompt": "x", "steps": 2, "seconds": 0.01, "window_seconds": 0.005,
          "window_overlap": 1.5}, "window_overlap"),
    ):
        code, resp = _post(base + "/v1/generate", body)
        assert code == 400, body
        assert frag in resp["error"], (body, resp)


def test_genparams_validate_mirrors_pipeline_rules():
    """validate() accepts what the pipeline accepts: the covering-window +
    guidance-interval combination IS the standard path (generate.py allows
    it), so only a window that actually windows is rejected."""
    GenParams(num_inference_steps=2, audio_length_in_s=0.01,
              guidance_interval=(0.1, 0.5)).validate()
    # covering window (window >= clip) with gi: allowed
    GenParams(num_inference_steps=2, audio_length_in_s=0.01, window_seconds=0.02,
              guidance_interval=(0.1, 0.5)).validate()
    with pytest.raises(ValueError, match="windowed"):
        GenParams(num_inference_steps=2, audio_length_in_s=0.01, window_seconds=0.005,
                  guidance_interval=(0.1, 0.5)).validate()
    with pytest.raises(ValueError, match="scheduler"):
        GenParams(scheduler="euler").validate()


def test_geometry_allowlist_entry_type_coercion(engine):
    """Raw allowlist entries are coerced to the exact types
    GenParams.geometry() emits: a str-typed steps field used to pass the
    arity check yet could never match any request (silent dead config), and
    a list-valued guidance_interval blew up the ctor's frozenset() with a
    bare unhashable TypeError naming no entry (round-5 review finding)."""
    raw = ("2", "0.01", 2.0, "ddim", None, None, [0.05, 0.65])
    mb = Microbatcher(engine, max_batch=2, max_delay_ms=30.0, geometries=[raw])
    try:
        assert (2, 0.01, 2.0, "ddim", None, None, (0.05, 0.65)) in mb.geometries
    finally:
        mb.close()
    with pytest.raises(ValueError, match="bad geometry entry"):
        Microbatcher(engine, max_batch=2,
                     geometries=[(object(), 0.01, 2.0, "ddim", None, None, None)])
    with pytest.raises(ValueError, match="lo, hi"):
        Microbatcher(engine, max_batch=2,
                     geometries=[(2, 0.01, 2.0, "ddim", None, None, [0.1, 0.5, 0.9])])


def test_http_request_timeout_504(engine):
    """A request that cannot complete within request_timeout_s is a 504 —
    a timeout is the deadline's fault, not an internal error, so it must
    not masquerade as a 500 (round-5 hardening)."""
    mb = Microbatcher(engine, max_batch=2, max_delay_ms=30.0)
    srv = make_server(mb, sample_rate=16000, port=0, request_timeout_s=0.001)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    base = f"http://127.0.0.1:{srv.server_address[1]}"
    try:
        code, resp = _post(base + "/v1/generate",
                           {"prompt": "x", "steps": 2, "seconds": 0.01})
        assert code == 504, (code, resp)
        assert "did not complete" in resp["error"]
    finally:
        srv.shutdown()
        srv.server_close()
        mb.close()
