"""Driver entry points must keep working: single-chip forward lowering and
the 8-device multi-chip dry run (both trainers' sharded training steps)."""

import jax


def test_entry_lowers_single_chip():
    import __graft_entry__ as ge

    fn, example_args = ge.entry()
    # Abstract lowering catches shape/tracing regressions without paying a
    # full compile.
    jax.jit(fn).lower(*example_args)


def test_dryrun_multichip_8():
    import __graft_entry__ as ge

    assert len(jax.devices()) >= 8  # conftest: virtual 8-device CPU mesh
    ge.dryrun_multichip(8)
