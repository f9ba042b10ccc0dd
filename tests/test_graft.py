"""Driver entry points compile and run on the virtual CPU mesh."""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def test_entry_compiles():
    import jax
    import __graft_entry__ as g
    fn, args = g.entry()
    state, out = jax.jit(fn)(*args)
    assert out["bit_alloc"].shape[0] == args[1].shape[0]


def test_dryrun_multichip():
    import jax
    import __graft_entry__ as g
    n = min(8, len(jax.devices()))
    g.dryrun_multichip(n)
