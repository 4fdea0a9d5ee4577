"""LoRA subsystem tests: math parity against the installed peft library (the
reference's adapter engine, train_audioldm_lora.py:378-394), merge/unmerge
equivalence, and PEFT state-dict round-trips."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from audioldm_tpu.config import LoRAConfig, UNetConfig
from audioldm_tpu.lora import (
    export_peft_state_dict,
    import_peft_state_dict,
    init_lora,
    iter_lora_paths,
    merge_lora,
    unmerge_lora,
)
from audioldm_tpu.models import unet as unet_lib
from audioldm_tpu.models.nn import attention, init_attention

# per-test quick marks: the two unet-integration LoRA tests (each pays the
# full-graph eager dispatch, ~12-50 s) stay out of the quick tier; merge
# math is quick-covered by the linear-layer peft parity test

TINY_UNET = UNetConfig(
    in_channels=4,
    out_channels=4,
    block_out_channels=(8, 16),
    down_block_types=("CrossAttnDownBlock2D", "DownBlock2D"),
    up_block_types=("UpBlock2D", "CrossAttnUpBlock2D"),
    layers_per_block=1,
    norm_num_groups=4,
    attention_head_dim=2,
    projection_class_embeddings_input_dim=6,
)


@pytest.mark.quick
def test_peft_linear_parity(rng):
    """Our unmerged LoRA path must equal peft's Linear LoRA layer with shared
    weights (r=2, alpha=2, the reference's training config)."""
    from peft import LoraConfig as PeftLoraConfig
    from peft import get_peft_model

    class Tiny(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.to_q = torch.nn.Linear(8, 8)

        def forward(self, x):
            return self.to_q(x)

    torch.manual_seed(0)
    base = Tiny()
    peft_model = get_peft_model(
        base, PeftLoraConfig(r=2, lora_alpha=2, init_lora_weights="gaussian", target_modules=["to_q"])
    )
    # give lora_B nonzero values so the delta path is exercised
    with torch.no_grad():
        for n, p in peft_model.named_parameters():
            if "lora_B" in n:
                p.normal_(0, 0.1)

    sd = {k: v.detach().numpy() for k, v in peft_model.state_dict().items()}
    lora_tree, rank = import_peft_state_dict(sd)
    assert rank == 2
    assert "to_q" in lora_tree

    x = rng.standard_normal((3, 8)).astype(np.float32)
    with torch.no_grad():
        expected = peft_model(torch.from_numpy(x)).numpy()

    w = base.to_q.weight.detach().numpy().T
    b = base.to_q.bias.detach().numpy()
    scale = 2.0 / 2.0
    ours = x @ w + b + scale * (x @ np.asarray(lora_tree["to_q"]["a"]) @ np.asarray(lora_tree["to_q"]["b"]))
    np.testing.assert_allclose(ours, expected, atol=1e-5)


def test_unet_lora_targets_q_and_v():
    params = unet_lib.init_unet(jax.random.PRNGKey(0), TINY_UNET)
    cfg = LoRAConfig(r=2, lora_alpha=2, target_modules=("to_q", "to_v"))
    paths = [p for p, _ in iter_lora_paths(params, cfg.target_modules)]
    # tiny unet: 1 down attn + 1 mid attn + 2 up attns (layers_per_block+1),
    # each with attn1+attn2, each contributing to_q and to_v
    leaves = {p[-1] for p in paths}
    assert leaves == {"to_q", "to_v"}
    assert len(paths) == 4 * 2 * 2
    lora = init_lora(jax.random.PRNGKey(1), params, cfg)
    # B zero-init -> adapter starts as a no-op
    x = jnp.ones((1, 8, 8, 4))
    out_base = unet_lib.apply_unet(params, TINY_UNET, x, jnp.asarray([3]), class_labels=jnp.ones((1, 6)))
    out_lora = unet_lib.apply_unet(
        params, TINY_UNET, x, jnp.asarray([3]), class_labels=jnp.ones((1, 6)), lora=lora, lora_scale=cfg.scale
    )
    np.testing.assert_allclose(np.asarray(out_base), np.asarray(out_lora), atol=1e-6)


def test_merge_equals_unmerged_apply(rng):
    params = unet_lib.init_unet(jax.random.PRNGKey(0), TINY_UNET)
    cfg = LoRAConfig(r=2, lora_alpha=4)
    lora = init_lora(jax.random.PRNGKey(1), params, cfg)
    # randomize B so the adapter does something
    lora = jax.tree.map(lambda x: x + 0.05 * jax.random.normal(jax.random.PRNGKey(2), x.shape), lora)

    x = jnp.asarray(rng.standard_normal((2, 8, 8, 4)).astype(np.float32))
    t = jnp.asarray([3, 7])
    c = jnp.asarray(rng.standard_normal((2, 6)).astype(np.float32))

    out_unmerged = unet_lib.apply_unet(params, TINY_UNET, x, t, class_labels=c, lora=lora, lora_scale=cfg.scale)
    merged = merge_lora(params, lora, cfg)
    out_merged = unet_lib.apply_unet(merged, TINY_UNET, x, t, class_labels=c)
    np.testing.assert_allclose(np.asarray(out_unmerged), np.asarray(out_merged), atol=5e-5)

    # unmerge restores the base weights
    restored = unmerge_lora(merged, lora, cfg)
    for (pa, va), (pb, vb) in zip(
        jax.tree_util.tree_flatten_with_path(params)[0], jax.tree_util.tree_flatten_with_path(restored)[0]
    ):
        np.testing.assert_allclose(np.asarray(va), np.asarray(vb), atol=1e-5)


@pytest.mark.quick
def test_peft_export_import_roundtrip():
    # init_lora only reads kernel SHAPES from the base tree, so an aval tree
    # skips the ~20 s tiny-UNet init compile (quick-tier budget, VERDICT r4 #7)
    params = jax.eval_shape(lambda k: unet_lib.init_unet(k, TINY_UNET),
                            jax.random.PRNGKey(0))
    cfg = LoRAConfig(r=2, lora_alpha=2)
    lora = init_lora(jax.random.PRNGKey(1), params, cfg)
    sd = export_peft_state_dict(lora)
    assert all(k.startswith("base_model.model.") for k in sd)
    assert any("lora_A.weight" in k for k in sd)
    back, rank = import_peft_state_dict(sd)
    assert rank == 2
    flat_a = jax.tree_util.tree_flatten_with_path(lora)[0]
    flat_b = jax.tree_util.tree_flatten_with_path(back)[0]
    assert len(flat_a) == len(flat_b)
    for (pa, va), (pb, vb) in zip(flat_a, flat_b):
        assert pa == pb
        np.testing.assert_allclose(np.asarray(va), np.asarray(vb), atol=1e-6)


@pytest.mark.quick
def test_import_accelerate_save_state_format():
    """accelerator.save_state writes keys with '.default.' adapter names
    (the format generate_audio.py:32-33 loads)."""
    a = np.random.default_rng(0).standard_normal((2, 8)).astype(np.float32)
    b = np.zeros((8, 2), np.float32)
    sd = {
        "base_model.model.down_blocks.0.attentions.0.transformer_blocks.0.attn1.to_q.lora_A.default.weight": a,
        "base_model.model.down_blocks.0.attentions.0.transformer_blocks.0.attn1.to_q.lora_B.default.weight": b,
    }
    tree, rank = import_peft_state_dict(sd)
    assert rank == 2
    node = tree["down_blocks"]["0"]["attentions"]["0"]["transformer_blocks"]["0"]["attn1"]["to_q"]
    np.testing.assert_allclose(np.asarray(node["a"]), a.T)


@pytest.mark.quick
def test_compose_adapters_exact():
    """compose_adapters represents sum_i w_i*(alpha_i/r_i)*A_i B_i EXACTLY via
    rank concatenation: merging the composition equals sequentially merging
    each adapter with its B pre-scaled by w_i (merge is additive in W)."""
    from audioldm_tpu.lora import compose_adapters

    # merge math only needs VALUES, not a faithful init — numpy-fill the
    # aval tree instead of paying the eager per-leaf UNet init (~20 s on
    # this 1-core box; quick-tier budget, VERDICT r4 #7)
    npr = np.random.default_rng(0)
    params = jax.tree.map(
        lambda a: jnp.asarray(npr.standard_normal(a.shape), a.dtype),
        jax.eval_shape(lambda k: unet_lib.init_unet(k, TINY_UNET), jax.random.PRNGKey(0)),
    )
    cfg1 = LoRAConfig(r=2, lora_alpha=4)  # scale 2, targets (to_q, to_v)
    cfg2 = LoRAConfig(r=3, lora_alpha=3, target_modules=("to_q",))  # scale 1, subset
    mk = lambda key, cfg: jax.tree.map(
        lambda x: x + 0.05 * jnp.asarray(npr.standard_normal(x.shape), x.dtype),
        init_lora(jax.random.PRNGKey(key), params, cfg),
    )
    l1, l2 = mk(1, cfg1), mk(2, cfg2)
    w1, w2 = 0.7, -0.3

    composed, ccfg = compose_adapters([(l1, cfg1, w1), (l2, cfg2, w2)])
    assert ccfg.r == 5 and ccfg.scale == 1.0
    assert tuple(ccfg.target_modules) == ("to_q", "to_v")
    merged = merge_lora(params, composed, ccfg)

    def scale_b(tree, w):
        def walk(t):
            return {
                k: ({"a": v["a"], "b": w * v["b"]} if isinstance(v, dict) and "a" in v else walk(v))
                for k, v in t.items()
            }
        return walk(tree)

    expected = merge_lora(merge_lora(params, scale_b(l1, w1), cfg1), scale_b(l2, w2), cfg2)
    for (pa, va), (pb, vb) in zip(
        jax.tree_util.tree_flatten_with_path(merged)[0],
        jax.tree_util.tree_flatten_with_path(expected)[0],
    ):
        assert pa == pb
        np.testing.assert_allclose(np.asarray(va), np.asarray(vb), atol=1e-5, err_msg=str(pa))

    # rank concat shape check at a to_q path (targeted by both: 2+3) vs a
    # to_v path (only cfg1: rank 2)
    def ranks_of(tree, name):
        out = set()

        def walk(t):
            for k, v in t.items():
                if isinstance(v, dict) and "a" in v:
                    if k == name:
                        out.add(v["a"].shape[-1])
                elif isinstance(v, dict):
                    walk(v)

        walk(tree)
        return out

    assert ranks_of(composed, "to_q") == {5} and ranks_of(composed, "to_v") == {2}

    # single part, weight 1 == plain merge_lora
    solo, scfg = compose_adapters([(l1, cfg1, 1.0)])
    for (pa, va), (pb, vb) in zip(
        jax.tree_util.tree_flatten_with_path(merge_lora(params, solo, scfg))[0],
        jax.tree_util.tree_flatten_with_path(merge_lora(params, l1, cfg1))[0],
    ):
        np.testing.assert_allclose(np.asarray(va), np.asarray(vb), atol=1e-6)

    with pytest.raises(ValueError, match="at least one"):
        compose_adapters([])


@pytest.mark.quick
def test_compose_adapters_matches_peft_add_weighted_cat(rng):
    """compose_adapters must reproduce peft's add_weighted_adapter
    (combination_type="cat" — peft's exact method) with shared weights:
    two adapters of different rank/alpha, mixed 0.7/0.3."""
    from peft import LoraConfig as PeftLoraConfig
    from peft import get_peft_model, get_peft_model_state_dict

    class Tiny(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.to_q = torch.nn.Linear(8, 8)

        def forward(self, x):
            return self.to_q(x)

    torch.manual_seed(0)
    base = Tiny()
    cfg_one = PeftLoraConfig(r=2, lora_alpha=2, init_lora_weights="gaussian", target_modules=["to_q"])
    cfg_two = PeftLoraConfig(r=3, lora_alpha=6, init_lora_weights="gaussian", target_modules=["to_q"])
    pm = get_peft_model(base, cfg_one, adapter_name="one")
    pm.add_adapter("two", cfg_two)
    with torch.no_grad():
        for n, p in pm.named_parameters():
            if "lora_B" in n:
                p.normal_(0, 0.1)

    sd_one = {k: v.detach().numpy() for k, v in get_peft_model_state_dict(pm, adapter_name="one").items()}
    sd_two = {k: v.detach().numpy() for k, v in get_peft_model_state_dict(pm, adapter_name="two").items()}

    pm.add_weighted_adapter(["one", "two"], [0.7, 0.3], "mix", combination_type="cat")
    pm.set_adapter("mix")
    x = rng.standard_normal((3, 8)).astype(np.float32)
    with torch.no_grad():
        expected = pm(torch.from_numpy(x)).numpy()

    from audioldm_tpu.lora import compose_adapters

    t_one, r_one = import_peft_state_dict(sd_one)
    t_two, r_two = import_peft_state_dict(sd_two)
    assert (r_one, r_two) == (2, 3)
    composed, ccfg = compose_adapters([
        (t_one, LoRAConfig(r=2, lora_alpha=2), 0.7),
        (t_two, LoRAConfig(r=3, lora_alpha=6), 0.3),
    ])
    w = base.to_q.weight.detach().numpy().T
    b = base.to_q.bias.detach().numpy()
    node = composed["to_q"]
    ours = x @ w + b + ccfg.scale * (x @ np.asarray(node["a"]) @ np.asarray(node["b"]))
    np.testing.assert_allclose(ours, expected, atol=1e-5)
