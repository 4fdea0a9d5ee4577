"""Multi-LoRA serving tests (BASELINE config 5): per-request adapter
isolation in one batch, hot-swap via bank gather, merged-cache equivalence."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from audioldm_tpu.config import DDIMConfig, LoRAConfig
from audioldm_tpu.lora import init_lora
from audioldm_tpu.pipeline.generate import generate, random_modules
from audioldm_tpu.serve import AdapterBank, ServeEngine
from tests.test_pipeline import TINY_TEXT, TINY_UNET, TINY_VAE, TINY_VOC


class DummyTokenizer:
    def __call__(self, texts, max_length=None):
        n = 6
        ids = np.full((len(texts), n), 1, np.int32)
        mask = np.zeros((len(texts), n), np.int32)
        for i, t in enumerate(texts):
            toks = [0] + [5 + (hash(w) % 40) for w in t.split()][: n - 2] + [2]
            ids[i, : len(toks)] = toks
            mask[i, : len(toks)] = 1
        return {"input_ids": ids, "attention_mask": mask}


@pytest.fixture(scope="module")
def engine():
    modules = random_modules(
        jax.random.PRNGKey(0),
        unet_cfg=TINY_UNET, vae_cfg=TINY_VAE, text_cfg=TINY_TEXT, vocoder_cfg=TINY_VOC,
        ddim_cfg=DDIMConfig(),
    )
    lcfg = LoRAConfig(r=2, lora_alpha=4)
    a1 = init_lora(jax.random.PRNGKey(1), modules.unet, lcfg)
    a1 = jax.tree.map(lambda x: x + 0.05 * jax.random.normal(jax.random.PRNGKey(2), x.shape), a1)
    a2 = init_lora(jax.random.PRNGKey(3), modules.unet, lcfg)
    a2 = jax.tree.map(lambda x: x + 0.05 * jax.random.normal(jax.random.PRNGKey(4), x.shape), a2)
    bank = AdapterBank.from_adapters({"hiphop": a1, "jazz": a2}, lcfg)
    return ServeEngine(modules, DummyTokenizer(), lcfg, bank=bank, dtype=jnp.float32)


GEN = dict(num_inference_steps=2, audio_length_in_s=0.01, guidance_scale=2.0, seed=0)


def test_bank_slots(engine):
    assert engine.bank.names == {"base": 0, "hiphop": 1, "jazz": 2}
    idx = engine.bank.indices(["jazz", "base"])
    np.testing.assert_array_equal(np.asarray(idx), [2, 0])


def test_per_request_adapter_isolation(engine):
    """A mixed batch is served as per-adapter uniform sub-batches: row i's
    output must equal a uniform call for its group with the group-folded key
    (groups in sorted-name order) — the engine's documented contract."""
    prompts = ["hip hop beat", "hip hop beat"]
    mixed = engine.generate(prompts, adapters=["hiphop", "base"], **GEN)
    assert mixed.shape == (2, 160)
    key = jax.random.PRNGKey(GEN["seed"])
    gen = {k: v for k, v in GEN.items() if k != "seed"}
    # sorted group order: base (g=0), hiphop (g=1)
    base_row = engine.generate([prompts[1]], adapters=["base"],
                               rng_key=jax.random.fold_in(key, 0), **gen)
    hip_row = engine.generate([prompts[0]], adapters=["hiphop"],
                              rng_key=jax.random.fold_in(key, 1), **gen)
    np.testing.assert_allclose(mixed[1], base_row[0], atol=1e-6)
    np.testing.assert_allclose(mixed[0], hip_row[0], atol=1e-6)
    # adapters actually change the output
    base_same_key = engine.generate([prompts[0]], adapters=["base"],
                                    rng_key=jax.random.fold_in(key, 1), **gen)
    assert np.max(np.abs(hip_row[0] - base_same_key[0])) > 1e-6
    # different adapters differ
    jazz = engine.generate([prompts[0]], adapters=["jazz"],
                           rng_key=jax.random.fold_in(key, 1), **gen)
    assert np.max(np.abs(jazz[0] - hip_row[0])) > 1e-6


def test_base_slot_is_zero_adapter(engine):
    prompts = ["hip hop beat"]
    via_bank = engine.generate(prompts, adapters=["base"], **GEN)
    plain = engine.generate(prompts, adapters=None, **GEN)
    np.testing.assert_allclose(via_bank, plain, atol=1e-5)


def test_merged_cache_matches_bank_path(engine):
    prompts = ["hip hop beat", "hip hop beat"]
    via_bank = engine.generate(prompts, adapters=["jazz", "jazz"], **GEN)
    merged = engine.merged_modules("jazz")
    tok = DummyTokenizer()(list(prompts))
    u = DummyTokenizer()([""])
    wav = generate(
        merged,
        jnp.asarray(tok["input_ids"]), jnp.asarray(tok["attention_mask"]),
        jnp.asarray(u["input_ids"]), jnp.asarray(u["attention_mask"]),
        jax.random.PRNGKey(0),
        num_inference_steps=2, audio_length_in_s=0.01, guidance_scale=2.0,
    )
    np.testing.assert_allclose(via_bank, np.asarray(wav), atol=2e-4)


def test_seeded_rows_are_batch_independent(engine):
    """VERDICT round-3 #6: "same seed -> same waveform" must hold whatever
    else is co-batched. A seeded row embedded in a mixed batch (different
    prompts, different row position) must be bit-identical to the solo
    seeded call — per-row latent keys (ServeEngine._row_keys) make the
    draw independent of batch size and row ordinal. The LATENTS are
    bit-identical; the decoded waveform matches to float tolerance (XLA
    fuses each batch-size program differently, ~1e-8 reassociation
    jitter; bit-exact when the batch shapes coincide)."""
    gen = {k: v for k, v in GEN.items() if k != "seed"}
    solo = engine.generate(["hip hop beat"], seed=123, **gen)
    prompts = ["smooth jazz", "hip hop beat", "lo-fi rain", "drum solo"]
    mixed = engine.generate(prompts, seeds=[None, 123, None, None], seed=7, **gen)
    np.testing.assert_allclose(mixed[1], solo[0], atol=1e-6)
    # two different seeds in ONE batch each reproduce their solo calls
    solo5 = engine.generate(["lo-fi rain"], seed=5, **gen)
    both = engine.generate(prompts, seeds=[None, 123, 5, None], seed=9, **gen)
    np.testing.assert_allclose(both[1], solo[0], atol=1e-6)
    np.testing.assert_allclose(both[2], solo5[0], atol=1e-6)
    # unseeded rows still vary with the batch rng (no accidental pinning)
    assert not np.array_equal(mixed[0], both[0])


def test_seeded_rows_survive_mixed_adapter_split(engine):
    """Seeds must thread through the per-adapter sub-batch split: the
    seeded row's output equals the solo seeded call on its adapter even
    though the mixed batch was re-grouped and re-keyed per group."""
    gen = {k: v for k, v in GEN.items() if k != "seed"}
    solo = engine.generate(["hip hop beat"], adapters=["jazz"], seed=77, **gen)
    mixed = engine.generate(
        ["a beat", "hip hop beat", "quiet piano"],
        adapters=["base", "jazz", "hiphop"],
        seeds=[None, 77, None], seed=3, **gen,
    )
    np.testing.assert_allclose(mixed[1], solo[0], atol=1e-6)


def test_serve_dp_mesh_matches_single(engine):
    """DP-sharded serving matches unsharded output (BASELINE config 5:
    data-parallel over ICI, validated on the virtual CPU mesh)."""
    import jax.numpy as jnp

    from audioldm_tpu.parallel import make_mesh
    from audioldm_tpu.serve import ServeEngine

    mesh = make_mesh(8)
    dp_engine = ServeEngine(
        engine.modules, DummyTokenizer(), engine.lora_cfg, bank=engine.bank,
        mesh=mesh, dtype=jnp.float32,
    )
    # a dp mesh disables the mixed-batch split (sub-batches may not divide
    # the mesh) -> compare against the rank-r path, not the split path
    nosplit = ServeEngine(
        engine.modules, DummyTokenizer(), engine.lora_cfg, bank=engine.bank,
        dtype=jnp.float32, split_mixed_adapters=False,
    )
    prompts = ["hip hop beat"] * 8
    adapters = ["hiphop", "base", "jazz", "base", "hiphop", "jazz", "base", "hiphop"]
    sharded = dp_engine.generate(prompts, adapters=adapters, **GEN)
    plain = nosplit.generate(prompts, adapters=adapters, **GEN)
    assert sharded.shape == (8, 160)
    np.testing.assert_allclose(sharded, plain, atol=1e-5)


def test_submit_flush_microbatching(engine):
    t0 = engine.submit("hip hop beat", "hiphop")
    t1 = engine.submit("hip hop beat", None)
    t2 = engine.submit("hip hop beat", "jazz")
    assert (t0, t1, t2) == (0, 1, 2)
    wavs = engine.flush(num_inference_steps=2, audio_length_in_s=0.01,
                        guidance_scale=2.0, seed=0, max_batch=2)
    assert wavs.shape == (3, 160)
    assert np.all(np.isfinite(wavs))
    # queue drained
    assert engine.flush().size == 0


def test_flush_bucketing_one_compile(engine):
    """Two flushes of DIFFERENT queue lengths land in the same bucket and
    reuse one compiled fn (VERDICT weak #6: per-chunk-size retraces)."""
    t0 = engine.traces
    for _ in range(4):
        engine.submit("hip hop beat", "hiphop")
    out1 = engine.flush(**GEN)
    t1 = engine.traces
    # second flush, different queue length, same bucket
    for _ in range(3):
        engine.submit("boom bap", "hiphop")
    out2 = engine.flush(**GEN)
    t2 = engine.traces
    assert out1.shape == (4, 160) and out2.shape == (3, 160)
    assert t2 == t1  # second flush (size 3 -> bucket 4) reused the compile
    # a MIXED no-group flush splits into per-adapter sub-batches riding the
    # SAME plain bucket-2 fn. Warm that bucket explicitly first (a uniform
    # size-2 flush) so the no-retrace assertion holds on a fresh engine too,
    # not just after the other tests in this module populated the cache.
    engine.submit("warm up", "jazz")
    engine.submit("warm up", "jazz")
    engine.flush(**GEN)
    engine.submit("boom bap", "jazz")
    engine.submit("boom bap", "jazz")
    engine.submit("hip hop", "hiphop")
    engine.submit("hip hop", "hiphop")
    t3 = engine.traces
    out3 = engine.flush(group_by_adapter=False, **GEN)
    assert out3.shape == (4, 160)
    assert engine.traces == t3  # bucket-2 fn already compiled -> no retrace


def test_flush_rng_never_collides(engine):
    """Two same-size chunks in different flushes must NOT share latents
    (VERDICT weak #6: seed + chunk_index collided)."""
    engine.submit("hip hop beat", "hiphop")
    a = engine.flush(**GEN)
    engine.submit("hip hop beat", "hiphop")
    b = engine.flush(**GEN)
    assert np.max(np.abs(a - b)) > 1e-6


def test_adapters_without_bank_raise():
    """Requesting adapters on an engine with no bank must fail loudly, not
    silently serve base weights."""
    modules = random_modules(
        jax.random.PRNGKey(0),
        unet_cfg=TINY_UNET, vae_cfg=TINY_VAE, text_cfg=TINY_TEXT, vocoder_cfg=TINY_VOC,
        ddim_cfg=DDIMConfig(),
    )
    eng = ServeEngine(modules, DummyTokenizer(), LoRAConfig(r=2, lora_alpha=2), dtype=jnp.float32)
    with pytest.raises(ValueError, match="no AdapterBank"):
        eng.generate(["x"], adapters=["jazz"], **GEN)
    # base/None adapters are fine without a bank
    out = eng.generate(["x"], adapters=["base", None][:1], **GEN)
    assert out.shape == (1, 160)


def test_oversized_batch_chunks_to_max_bucket(engine):
    """A batch larger than the largest bucket splits into max-bucket chunks
    (no per-size retrace, dp divisibility preserved) and keeps row order."""
    eng = ServeEngine(
        engine.modules, DummyTokenizer(), engine.lora_cfg, bank=engine.bank,
        dtype=jnp.float32, bucket_sizes=(2,),
    )
    prompts = ["hip hop beat", "boom bap", "smooth jazz", "hip hop beat", "last one"]
    out = eng.generate(prompts, adapters=["hiphop"] * 5, **GEN)
    assert out.shape == (5, 160)
    assert eng.traces <= 1  # merged route, one bucket-2 compile total


def test_underfilled_bucket_keeps_merged_route(engine):
    """3 uniform-adapter requests padding up to bucket 4 must STILL route
    through the merged-weight cache (pad rows reuse the first adapter —
    they're trimmed from the output anyway)."""
    engine._merged_cache.clear()
    out = engine.generate(
        ["hip hop beat", "boom bap", "hip hop beat"],
        adapters=["hiphop", "hiphop", "hiphop"], **GEN,
    )
    assert out.shape == (3, 160)
    assert "hiphop" in engine._merged_cache  # merged path was taken
    full = engine.generate(
        ["hip hop beat", "boom bap", "hip hop beat", "x"],
        adapters=["hiphop"] * 4, **GEN,
    )
    np.testing.assert_allclose(out, full[:3], atol=1e-6)


def test_hybrid_dense_serving_matches_rank_r(engine):
    """dense_lora_max_dim (hybrid ΔW densification) must be numerically
    identical to the rank-r path on a mixed-adapter batch."""
    hybrid = ServeEngine(
        engine.modules, DummyTokenizer(), engine.lora_cfg, bank=engine.bank,
        dtype=jnp.float32, dense_lora_max_dim=128, split_mixed_adapters=False,
    )
    rank_r = ServeEngine(
        engine.modules, DummyTokenizer(), engine.lora_cfg, bank=engine.bank,
        dtype=jnp.float32, split_mixed_adapters=False,
    )
    prompts = ["hip hop beat", "smooth jazz"]
    adapters = ["hiphop", "jazz"]
    a = rank_r.generate(prompts, adapters=adapters, **GEN)
    b = hybrid.generate(prompts, adapters=adapters, **GEN)
    np.testing.assert_allclose(a, b, atol=1e-5)


def test_gather_dense_matches_rank_r(engine):
    """gather_dense's per-request ΔW=AB equals the rank-r pair it densifies
    (kept for small-C geometries; the audioldm-s serve path uses rank-r —
    see engine.generate NB)."""
    idx = engine.bank.indices(["hiphop", "jazz"])
    sliver = engine.bank.gather(idx, cfg_batch=2)
    dense = engine.bank.gather_dense(idx, cfg_batch=2, dtype=jnp.float32)
    flat_s = jax.tree_util.tree_flatten_with_path(
        sliver, is_leaf=lambda x: isinstance(x, dict) and "a" in x
    )[0]
    flat_d = jax.tree_util.tree_flatten_with_path(
        dense, is_leaf=lambda x: isinstance(x, dict) and "ab" in x
    )[0]
    assert len(flat_s) == len(flat_d) > 0
    for (pa, s), (pb, d) in zip(flat_s, flat_d):
        assert pa == pb
        want = np.einsum("bir,bro->bio", np.asarray(s["a"]), np.asarray(s["b"]))
        np.testing.assert_allclose(np.asarray(d["ab"]), want, atol=1e-5)


def test_flush_groups_by_adapter_and_restores_order(engine):
    """group_by_adapter sorts interleaved requests into adapter-uniform
    chunks (merged-cache eligible) and returns outputs in SUBMISSION order."""
    import jax as _jax

    engine._rng_counter = 0
    engine._queue = []
    gen = {k: v for k, v in GEN.items() if k != "seed"}
    prompts = ["hip hop beat", "jazz piano", "boom bap", "smooth sax"]
    adapters = ["hiphop", "jazz", "hiphop", "jazz"]
    for p, a in zip(prompts, adapters):
        engine.submit(p, a)
    out = engine.flush(max_batch=2, seed=7, **gen)
    assert out.shape == (4, 160)
    # expected chunks after the stable sort: (hiphop: idx 0,2), (jazz: idx 1,3)
    base = _jax.random.PRNGKey(7)
    c1 = engine.generate(["hip hop beat", "boom bap"], adapters=["hiphop", "hiphop"],
                         rng_key=_jax.random.fold_in(base, 1), **gen)
    c2 = engine.generate(["jazz piano", "smooth sax"], adapters=["jazz", "jazz"],
                         rng_key=_jax.random.fold_in(base, 2), **gen)
    np.testing.assert_allclose(out[0], c1[0], atol=1e-6)
    np.testing.assert_allclose(out[2], c1[1], atol=1e-6)
    np.testing.assert_allclose(out[1], c2[0], atol=1e-6)
    np.testing.assert_allclose(out[3], c2[1], atol=1e-6)


def test_uniform_batch_routes_through_merged_cache(engine):
    """A uniform-adapter batch must serve from the merged-weight cache and
    match the per-request unmerged path numerically."""
    prompts = ["hip hop beat", "boom bap"]
    engine._merged_cache.clear()
    uniform = engine.generate(prompts, adapters=["hiphop", "hiphop"], **GEN)
    assert "hiphop" in engine._merged_cache  # merged path was taken
    # reference: unmerged per-request gather (rank-r path — forced via a
    # split-disabled engine and a mixed batch with one base row; rows 0,1
    # stay comparable thanks to threefry prefix stability across buckets)
    nosplit = ServeEngine(
        engine.modules, DummyTokenizer(), engine.lora_cfg, bank=engine.bank,
        dtype=jnp.float32, split_mixed_adapters=False,
    )
    mixed = nosplit.generate(prompts + ["filler"], adapters=["hiphop", "hiphop", "base"], **GEN)
    np.testing.assert_allclose(uniform[:2], mixed[:2], atol=2e-4)


def test_generate_pads_to_bucket_and_slices(engine):
    out = engine.generate(["hip hop beat"], adapters=["hiphop"], **GEN)
    assert out.shape == (1, 160)  # bucket padding never leaks into the result
    out3 = engine.generate(["a", "b", "c"], adapters=["jazz", "jazz", "jazz"], **GEN)
    assert out3.shape == (3, 160)


def test_mixed_batch_splits_to_merged_subbatches(engine):
    """Mixed-adapter batches route as per-adapter uniform sub-batches on the
    merged-weight cache (VERDICT round-2 #7: one chip saturates at CFG
    batch 2, so K merged sub-batches beat one rank-r gathered batch):
    - every non-base group lands in the merged cache;
    - no 'lora' (rank-r) fn is compiled;
    - outputs equal K uniform calls with group-folded keys, rows restored.
    """
    eng = ServeEngine(
        engine.modules, DummyTokenizer(), engine.lora_cfg, bank=engine.bank,
        dtype=jnp.float32,
    )
    prompts = ["hip hop beat", "smooth jazz", "boom bap", "plain"]
    adapters = ["hiphop", "jazz", "hiphop", None]
    out = eng.generate(prompts, adapters=adapters, **GEN)
    assert out.shape == (4, 160)
    assert set(eng._merged_cache) == {"hiphop", "jazz"}
    assert not any(k[0] == "lora" for k in eng._fns)  # never took rank-r

    key = jax.random.PRNGKey(GEN["seed"])
    gen = {k: v for k, v in GEN.items() if k != "seed"}
    # groups in sorted-name order: base (g0), hiphop (g1), jazz (g2)
    base = eng.generate(["plain"], adapters=["base"], rng_key=jax.random.fold_in(key, 0), **gen)
    hip = eng.generate(["hip hop beat", "boom bap"], adapters=["hiphop", "hiphop"],
                       rng_key=jax.random.fold_in(key, 1), **gen)
    jazz = eng.generate(["smooth jazz"], adapters=["jazz"], rng_key=jax.random.fold_in(key, 2), **gen)
    np.testing.assert_allclose(out[3], base[0], atol=1e-6)
    np.testing.assert_allclose(out[0], hip[0], atol=1e-6)
    np.testing.assert_allclose(out[2], hip[1], atol=1e-6)
    np.testing.assert_allclose(out[1], jazz[0], atol=1e-6)


def test_generate_empty_batch(engine):
    """generate([]) returns an empty array without dispatching anything."""
    out = engine.generate([], **GEN)
    assert out.shape == (0, 0) and out.dtype == np.float32


def test_mixed_split_cost_gate_keeps_rank_r_on_coarse_buckets(engine):
    """With ONLY coarse buckets every per-adapter sub-batch would pad to a
    full batch (measured 2.23 vs 1.16 s/clip at bucket_sizes=(4,), PERF.md),
    so the cost gate must keep the rank-r gathered path there — and still
    split when fine buckets exist."""
    coarse = ServeEngine(
        engine.modules, DummyTokenizer(), engine.lora_cfg, bank=engine.bank,
        dtype=jnp.float32, bucket_sizes=(4,),
    )
    prompts = ["hip hop beat", "smooth jazz", "boom bap", "plain"]
    adapters = ["hiphop", "jazz", "hiphop", "base"]
    out = coarse.generate(prompts, adapters=adapters, **GEN)
    assert out.shape == (4, 160)
    assert any(k[0] == "lora" for k in coarse._fns)  # took rank-r
    assert not coarse._merged_cache  # never split to merged sub-batches
    # rank-r route output matches a split-disabled engine bit-for-bit
    nosplit = ServeEngine(
        engine.modules, DummyTokenizer(), engine.lora_cfg, bank=engine.bank,
        dtype=jnp.float32, bucket_sizes=(4,), split_mixed_adapters=False,
    )
    ref = nosplit.generate(prompts, adapters=adapters, **GEN)
    np.testing.assert_allclose(out, ref, atol=0)

    fine = ServeEngine(
        engine.modules, DummyTokenizer(), engine.lora_cfg, bank=engine.bank,
        dtype=jnp.float32, bucket_sizes=(1, 2, 4),
    )
    fine.generate(prompts, adapters=adapters, **GEN)
    assert not any(k[0] == "lora" for k in fine._fns)  # split route taken
    assert set(fine._merged_cache) == {"hiphop", "jazz"}


def test_flush_overlapped_dispatch_matches_sequential(engine):
    """flush dispatches every chunk before fetching (device->host transfer
    of chunk i overlaps chunk i+1's compute); outputs must be IDENTICAL to
    fetching each chunk synchronously (VERDICT round-2 #6)."""
    engine._rng_counter = 0
    gen = {k: v for k, v in GEN.items() if k != "seed"}
    prompts = ["hip hop beat", "jazz piano", "boom bap", "smooth sax"]
    adapters = ["hiphop", "jazz", "hiphop", "jazz"]
    for p, a in zip(prompts, adapters):
        engine.submit(p, a)
    out = engine.flush(max_batch=2, seed=11, **gen)

    # sequential reference: same chunking, fetch immediately per chunk
    base = jax.random.PRNGKey(11)
    c1 = engine.generate(["hip hop beat", "boom bap"], adapters=["hiphop", "hiphop"],
                         rng_key=jax.random.fold_in(base, 1), **gen)
    c2 = engine.generate(["jazz piano", "smooth sax"], adapters=["jazz", "jazz"],
                         rng_key=jax.random.fold_in(base, 2), **gen)
    np.testing.assert_allclose(out[[0, 2]], c1, atol=0)
    np.testing.assert_allclose(out[[1, 3]], c2, atol=0)


def test_serve_with_fused_mrf_matches(engine):
    # integration: the fused Pallas MRF vocoder (interpret on CPU) inside
    # the serve engine's compiled programs == the XLA path; a FRESH engine
    # is required because compiled programs are cached per bucket
    from audioldm_tpu.kernels import mrf_conv

    prompts = ["hip hop beat", "smooth jazz"]
    adapters = ["hiphop", "jazz"]
    base = engine.generate(prompts, adapters=adapters, **GEN)

    fresh = ServeEngine(
        engine.modules, DummyTokenizer(), engine.lora_cfg, bank=engine.bank,
        dtype=jnp.float32,
    )
    orig = mrf_conv._BLOCK_T_CANDIDATES
    orig_stage = mrf_conv.fused_mrf_stage
    calls = []
    mrf_conv.fused_mrf_stage = lambda *a, **kw: (calls.append(1), orig_stage(*a, **kw))[1]
    mrf_conv._BLOCK_T_CANDIDATES = (16, 8)  # tiny-geometry stages route
    mrf_conv.use_fused_mrf(True)
    try:
        routed = fresh.generate(prompts, adapters=adapters, **GEN)
    finally:
        mrf_conv.use_fused_mrf(False)
        mrf_conv._BLOCK_T_CANDIDATES = orig
        mrf_conv.fused_mrf_stage = orig_stage
    assert calls, "fused MRF kernel did not route — the test would be vacuous"
    np.testing.assert_allclose(np.asarray(routed), np.asarray(base), atol=5e-5, rtol=5e-5)


def test_warmup_precompiles_buckets_concurrently(engine):
    """warmup() drives every bucket's program through the normal dispatch
    path from parallel threads: later traffic must produce bit-identical
    output to an un-warmed engine and hit the jit caches (no new traces)."""
    eng = ServeEngine(
        engine.modules, DummyTokenizer(), engine.lora_cfg, bank=engine.bank,
        dtype=jnp.float32, bucket_sizes=(1, 2),
    )
    kw = dict(num_inference_steps=2, audio_length_in_s=0.01, guidance_scale=2.0,
              scheduler="ddim")
    eng.warmup(**kw, adapter="hiphop")
    t0 = eng.traces
    assert "hiphop" in eng._merged_cache  # merge itself warmed too
    wav = eng.generate(["a b", "c d"], adapters=["hiphop"] * 2, seed=0, **kw)
    assert eng.traces == t0  # both buckets + vocoder already compiled
    ref = engine.generate(["a b", "c d"], adapters=["hiphop"] * 2, seed=0, **kw)
    np.testing.assert_array_equal(np.asarray(wav), np.asarray(ref))


def test_composed_adapter_serves_from_merged_cache(engine):
    """add_composed registers an EXACT weighted multi-LoRA merge served with
    zero adapter overhead; output must equal a fresh engine whose base UNet
    has the composition merged manually (lora/adapter.py compose_adapters)."""
    from audioldm_tpu.lora import compose_adapters, merge_lora

    engine.add_composed("fusion", {"hiphop": 0.7, "jazz": 0.3})
    assert engine.has_adapter("fusion") and not engine.has_adapter("nope")
    out = engine.generate(["hip hop beat"], adapters=["fusion"], **GEN)

    parts = []
    for name, w in (("hiphop", 0.7), ("jazz", 0.3)):
        idx = engine.bank.names[name]
        adapter = jax.tree.map(lambda bnk: bnk[idx], engine.bank.stacked)
        parts.append((adapter, engine.lora_cfg, w))
    composed, ccfg = compose_adapters(parts)
    manual = ServeEngine(
        engine.modules._replace(unet=merge_lora(engine.modules.unet, composed, ccfg)),
        DummyTokenizer(), engine.lora_cfg, dtype=jnp.float32,
    )
    ref = manual.generate(["hip hop beat"], **GEN)
    np.testing.assert_allclose(out, ref, atol=1e-6)
    # composition differs from both components
    hip = engine.generate(["hip hop beat"], adapters=["hiphop"], **GEN)
    assert np.max(np.abs(out - hip)) > 1e-6


def test_composed_in_mixed_batch_rides_split_route(engine):
    """A mixed batch containing a composed name splits into per-adapter
    uniform sub-batches (the composed group hits the merged cache)."""
    engine.add_composed("fusion2", {"hiphop": 0.5, "jazz": 0.5})
    prompts = ["hip hop beat", "smooth jazz"]
    mixed = engine.generate(prompts, adapters=["fusion2", "base"], **GEN)
    key = jax.random.PRNGKey(GEN["seed"])
    gen = {k: v for k, v in GEN.items() if k != "seed"}
    # sorted group order: base (g=0), fusion2 (g=1)
    base_row = engine.generate([prompts[1]], adapters=["base"],
                               rng_key=jax.random.fold_in(key, 0), **gen)
    fus_row = engine.generate([prompts[0]], adapters=["fusion2"],
                              rng_key=jax.random.fold_in(key, 1), **gen)
    np.testing.assert_allclose(mixed[1], base_row[0], atol=1e-6)
    np.testing.assert_allclose(mixed[0], fus_row[0], atol=1e-6)


def test_composed_rank_r_path_raises(engine):
    """With the mixed-split route disabled, a composed name cannot ride the
    rank-r gathered path (its rank exceeds the bank's) — clear error, not a
    silent fallback."""
    eng = ServeEngine(
        engine.modules, DummyTokenizer(), engine.lora_cfg, bank=engine.bank,
        dtype=jnp.float32, split_mixed_adapters=False,
    )
    eng.add_composed("mix", {"hiphop": 1.0})
    with pytest.raises(ValueError, match="rank-r"):
        eng.generate(["a", "b"], adapters=["mix", "jazz"], **GEN)


def test_unknown_adapter_fails_fast_with_bank(engine):
    with pytest.raises(ValueError, match="unknown adapter"):
        engine.generate(["x"], adapters=["no-such"], **GEN)


def test_compose_validates_components(engine):
    with pytest.raises(KeyError, match="cannot compose"):
        engine.add_composed("bad", {"hiphop": 0.5, "ghost": 0.5})
    with pytest.raises(KeyError, match="cannot compose"):
        engine.add_composed("bad", {"base": 1.0})


def test_per_request_negative_prompt(engine):
    """generate(negative_prompt=...) overrides the engine default for the
    batch: output equals an engine constructed with that negative prompt,
    and differs from the default-neg output (CFG uncond row changes)."""
    out_over = engine.generate(["hip hop beat"], negative_prompt="low quality", **GEN)
    eng_neg = ServeEngine(
        engine.modules, DummyTokenizer(), engine.lora_cfg, bank=engine.bank,
        dtype=jnp.float32, negative_prompt="low quality",
    )
    ref = eng_neg.generate(["hip hop beat"], **GEN)
    np.testing.assert_allclose(out_over, ref, atol=1e-6)
    out_default = engine.generate(["hip hop beat"], **GEN)
    assert np.max(np.abs(out_over - out_default)) > 1e-7


def test_engine_windowed_generation(engine):
    """window_seconds threads through the serving engine: a clip-covering
    window reproduces the standard output; a real window changes it."""
    std = engine.generate(["hip hop beat"], **GEN)
    cov = engine.generate(["hip hop beat"], window_seconds=1.0, **GEN)
    np.testing.assert_array_equal(cov, std)
    win = engine.generate(["hip hop beat"], window_seconds=0.002, **GEN)
    assert win.shape == std.shape
    assert np.max(np.abs(win - std)) > 1e-7


def test_composed_name_collision_rejected(engine):
    """A composed name may not shadow a bank adapter (it would hijack the
    merged-cache route while rank-r batches still gather bank weights)."""
    with pytest.raises(ValueError, match="collides"):
        engine.add_composed("hiphop", {"jazz": 1.0})


def test_refresh_composed_recomputes_from_new_component(engine):
    """refresh_composed('x') rebuilds every composition referencing x from
    the CURRENT bank weights (hot-reload staleness, code-review finding)."""
    eng = ServeEngine(
        engine.modules, DummyTokenizer(), engine.lora_cfg,
        bank=AdapterBank.from_adapters(
            {"x": jax.tree.map(lambda b: b[engine.bank.names["hiphop"]], engine.bank.stacked)},
            engine.lora_cfg),
        dtype=jnp.float32,
    )
    eng.add_composed("blend", {"x": 1.0})
    out1 = eng.generate(["beat"], adapters=["blend"], **GEN)
    # hot-replace component x in the bank, then refresh
    idx = eng.bank.names["x"]
    jazz = jax.tree.map(lambda b: b[engine.bank.names["jazz"]], engine.bank.stacked)
    eng.bank.stacked = jax.tree.map(lambda bank, leaf: bank.at[idx].set(leaf), eng.bank.stacked, jazz)
    eng._merged_cache.pop("x", None)
    assert eng.refresh_composed("x") == ["blend"]
    out2 = eng.generate(["beat"], adapters=["blend"], **GEN)
    assert np.max(np.abs(out1 - out2)) > 1e-7
    # blend == 1.0*x, so the refreshed composition equals the new component merged
    direct = eng.generate(["beat"], adapters=["x"], **GEN)
    np.testing.assert_allclose(out2, direct, atol=1e-6)


# -- AdapterBank capacity/slot mechanics (VERDICT round-3 #7) ---------------


def _toy_adapter(v: float) -> dict:
    return {"q": {"a": jnp.full((4, 2), v, jnp.float32),
                  "b": jnp.full((2, 4), v, jnp.float32)}}


def test_bank_prealloc_growth_and_slot_reuse():
    """Slots are preallocated: adds below capacity keep leaf shapes stable
    (hot-load never changes any shape a caller could have cached), a full
    bank doubles once, remove zeroes + frees the slot, and the next add
    reuses it — no full-bank re-concat anywhere."""
    bank = AdapterBank(_toy_adapter(0.0), rank=2, capacity=4)
    assert bank.capacity == 4 and len(bank) == 1  # base only
    bank.add("x", _toy_adapter(1.0))
    bank.add("y", _toy_adapter(2.0))
    assert bank.capacity == 4  # stable below capacity
    assert bank.names == {"base": 0, "x": 1, "y": 2}
    got = bank.gather(bank.indices(["y", "base", "x"]))
    np.testing.assert_array_equal(np.asarray(got["q"]["a"][0]), np.full((4, 2), 2.0))
    np.testing.assert_array_equal(np.asarray(got["q"]["a"][1]), np.zeros((4, 2)))
    np.testing.assert_array_equal(np.asarray(got["q"]["b"][2]), np.full((2, 4), 1.0))

    bank.add("z", _toy_adapter(3.0))   # slot 3 = last free
    bank.add("w", _toy_adapter(4.0))   # full -> doubles
    assert bank.capacity == 8

    bank.remove("x")
    assert "x" not in bank.names
    # the freed slot is ZEROED: a stale index gathers base weights,
    # never deleted ones
    stale = np.asarray(jax.tree.leaves(bank.stacked)[0][1])
    assert np.abs(stale).max() == 0.0
    # and reused by the next add
    assert bank.add("r", _toy_adapter(5.0)) == 1
    # replace-in-place keeps the slot
    assert bank.add("r", _toy_adapter(6.0)) == 1
    got = bank.gather(bank.indices(["r"]))
    np.testing.assert_array_equal(np.asarray(got["q"]["a"][0]), np.full((4, 2), 6.0))

    with pytest.raises(KeyError, match="unknown adapter"):
        bank.remove("nope")
    with pytest.raises(ValueError, match="base"):
        bank.remove("base")
    with pytest.raises(ValueError, match="reserved"):
        bank.add("base", _toy_adapter(1.0))


def test_bank_max_capacity_enforced():
    bank = AdapterBank(_toy_adapter(0.0), rank=2, capacity=2, max_capacity=2)
    bank.add("x", _toy_adapter(1.0))
    assert bank.full
    with pytest.raises(ValueError, match="full"):
        bank.add("y", _toy_adapter(2.0))
    bank.add("x", _toy_adapter(3.0))  # replacing never needs a new slot
    bank.remove("x")
    assert not bank.full
    bank.add("y", _toy_adapter(2.0))


def test_engine_remove_adapter_guards():
    """remove_adapter frees bank slots and drops merged caches; removing a
    composition component is refused until the composition goes first."""
    from audioldm_tpu.config import DDIMConfig

    modules = random_modules(
        jax.random.PRNGKey(0),
        unet_cfg=TINY_UNET, vae_cfg=TINY_VAE, text_cfg=TINY_TEXT, vocoder_cfg=TINY_VOC,
        ddim_cfg=DDIMConfig(),
    )
    lcfg = LoRAConfig(r=2, lora_alpha=4)
    a1 = init_lora(jax.random.PRNGKey(1), modules.unet, lcfg)
    a2 = init_lora(jax.random.PRNGKey(2), modules.unet, lcfg)
    eng = ServeEngine(modules, DummyTokenizer(), lcfg,
                      bank=AdapterBank.from_adapters({"p": a1, "q": a2}, lcfg),
                      dtype=jnp.float32)
    eng.add_composed("mix", {"p": 0.5, "q": 0.5})
    with pytest.raises(ValueError, match="component"):
        eng.remove_adapter("p")
    eng.remove_adapter("mix")       # composition first...
    assert "mix" not in eng.composed and "mix" not in eng._merged_cache
    eng.remove_adapter("p")         # ...then the component
    assert not eng.has_adapter("p") and eng.has_adapter("q")
    with pytest.raises(KeyError, match="unknown adapter"):
        eng.remove_adapter("p")


def test_guidance_interval_serving(engine):
    """guidance_interval is a compile-key field: an empty interval must equal
    the guidance-1.0 path row-for-row, and a sub-interval must differ from
    standard CFG (pipeline/generate.py limited-interval guidance)."""
    from audioldm_tpu.models.scheduler import inference_timesteps

    prompts = ["hip hop beat"]
    n = engine.modules.ddim_cfg.num_train_timesteps
    ts = inference_timesteps(engine.modules.ddim_cfg, GEN["num_inference_steps"])
    empty = (float(max(ts) + 0.5) / (n - 1), float(max(ts) + 0.6) / (n - 1))
    gi_empty = engine.generate(prompts, guidance_interval=empty, **GEN)
    g1 = {**GEN, "guidance_scale": 1.0}
    cond_only = engine.generate(prompts, **g1)
    np.testing.assert_array_equal(gi_empty, cond_only)

    std = engine.generate(prompts, **GEN)
    # exclude the HIGH-noise step (ts=[501, 1] at 2 steps): guidance there
    # has a real effect, so the outputs must differ (excluding only the
    # t~0 step changes the waveform by ~1e-8 — guidance near zero noise is
    # attenuated by sqrt(1-acp), the paper's point)
    mid = engine.generate(prompts, guidance_interval=(0.0, 0.3), **GEN)
    assert mid.shape == std.shape and np.all(np.isfinite(mid))
    assert np.max(np.abs(mid - std)) > 1e-7


def test_guidance_interval_on_rank_r_batched_lora(engine):
    """Limited-interval CFG must work on the rank-r gathered path, where the
    per-request lora leaves are CFG-tiled to [2b, ...]: the conditional-only
    branch slices the first b rows (gather tiles the same adapters into both
    halves — pipeline/generate.py lora_cond). Pre-fix this crashed at trace
    time with a batch mismatch (code-review finding). An empty interval must
    equal the guidance-1.0 rank-r run exactly."""
    from audioldm_tpu.models.scheduler import inference_timesteps

    nosplit = ServeEngine(
        engine.modules, DummyTokenizer(), engine.lora_cfg, bank=engine.bank,
        dtype=jnp.float32, split_mixed_adapters=False,
    )
    prompts = ["hip hop beat", "smooth jazz"]
    adapters = ["hiphop", "jazz"]
    n = engine.modules.ddim_cfg.num_train_timesteps
    ts = inference_timesteps(engine.modules.ddim_cfg, GEN["num_inference_steps"])
    empty = (float(max(ts) + 0.5) / (n - 1), float(max(ts) + 0.6) / (n - 1))
    gi_empty = nosplit.generate(prompts, adapters=adapters,
                                guidance_interval=empty, **GEN)
    g1 = {**GEN, "guidance_scale": 1.0}
    cond_only = nosplit.generate(prompts, adapters=adapters, **g1)
    np.testing.assert_allclose(gi_empty, cond_only, atol=1e-6)
    # a sub-interval runs both branches of the lax.cond — finite and distinct
    mid = nosplit.generate(prompts, adapters=adapters,
                           guidance_interval=(0.0, 0.3), **GEN)
    std = nosplit.generate(prompts, adapters=adapters, **GEN)
    assert np.all(np.isfinite(mid))
    assert np.max(np.abs(mid - std)) > 1e-7


def test_bank_rejects_bad_adapter_atomically():
    """A mismatched adapter tree must be rejected BEFORE any slot write:
    _write's donated updates delete the old bank buffers as they go, so a
    mid-tree failure would leave the bank referencing deleted arrays
    (code-review finding). After a rejected add the bank must still serve."""
    bank = AdapterBank(_toy_adapter(0.0), rank=2, capacity=4)
    bank.add("good", _toy_adapter(1.0))
    # wrong leaf shape
    bad = {"q": {"a": jnp.ones((4, 2), jnp.float32), "b": jnp.ones((3, 4), jnp.float32)}}
    with pytest.raises(ValueError, match="bank unchanged"):
        bank.add("bad", bad)
    # wrong tree structure
    with pytest.raises(ValueError, match="bank unchanged|custom node"):
        bank.add("bad", {"q": {"a": jnp.ones((4, 2), jnp.float32)}})
    assert "bad" not in bank.names
    # the bank is untouched and still serves
    got = bank.gather(bank.indices(["good", "base"]))
    np.testing.assert_array_equal(np.asarray(got["q"]["a"][0]), np.full((4, 2), 1.0))
    np.testing.assert_array_equal(np.asarray(got["q"]["a"][1]), np.zeros((4, 2)))
    # dtype mismatches are cast to the bank dtype, not errors
    bank.add("f64", {"q": {"a": np.full((4, 2), 2.0, np.float64),
                           "b": np.full((2, 4), 2.0, np.float64)}})
    leaf = jax.tree.leaves(bank.gather(bank.indices(["f64"])))[0]
    assert leaf.dtype == jnp.float32
