"""Driver-contract test: dryrun_multichip must build a (data x model)
mesh over the 8 virtual CPU devices and run one full TP+DP training step."""

import sys


def test_dryrun_multichip_8():
    sys.path.insert(0, "/root/repo")
    import __graft_entry__

    __graft_entry__.dryrun_multichip(8)  # asserts internally


def test_entry_signature():
    import inspect

    import __graft_entry__

    sig = inspect.signature(__graft_entry__.entry)
    assert len(sig.parameters) == 0
