"""Driver-contract tests: entry() lowers; dryrun_multichip runs a real
DP-sharded training step on the virtual 8-device mesh."""

import jax


def test_entry_lowers():
    import __graft_entry__ as g

    fn, args = g.entry()
    lowered = jax.jit(fn).lower(*args)
    assert lowered.compiler_ir("stablehlo") is not None


def test_dryrun_multichip_8():
    import __graft_entry__ as g

    g.dryrun_multichip(8)  # raises on failure
