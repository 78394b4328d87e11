"""Op-stream / candidate-order contract: one definition site, no skew.

native/op_contract.h is the single source of truth for the opcode numbering,
per-op strides, and the pass-1 candidate-mode order. These tests pin that
(a) the Python parse is sane and complete, (b) every consumer module reads
the shared table, and (c) the COMPILED C++ library agrees with the header it
was built from (catches a stale .so or a hand-edited duplicate).
"""

import numpy as np
import pytest

from cavif_tpu.native import contract


def test_contract_parse():
    assert len(contract.OPS) == 10
    assert sorted(c for c, _ in contract.OPS.values()) == list(range(10))
    assert len(contract.CAND_MODES) == 13
    assert sorted(contract.CAND_MODES) == list(range(13))
    # semantic split used by the searches: 7 non-directional + 6 diagonals
    assert contract.CAND_MODES[:3] == (0, 1, 2)
    assert set(contract.CAND_MODES[7:]) == {3, 4, 5, 6, 7, 8}


def test_consumers_share_table():
    from cavif_tpu.av1 import opstream
    from cavif_tpu.av1.encoder import CAND_MODES_SEARCH
    from cavif_tpu.ops import block_search

    for name, (code, _ar) in contract.OPS.items():
        assert getattr(opstream, name) == code
    assert tuple(CAND_MODES_SEARCH) == contract.CAND_MODES
    assert tuple(block_search.CAND_MODES) == contract.CAND_MODES
    assert (
        tuple(block_search.NONDIRECTIONAL) + tuple(block_search.DIAG_MODES)
        == contract.CAND_MODES
    )


def test_native_library_agrees():
    native = pytest.importorskip("cavif_tpu.native")
    try:
        arity0 = native.op_arity_native(0)
    except Exception:
        pytest.skip("native library unavailable")
    assert arity0 == contract.OP_ARITY[0]
    for code, ar in contract.OP_ARITY.items():
        assert native.op_arity_native(code) == ar
    assert native.op_arity_native(99) == -1
    assert native.cand_modes_native() == contract.CAND_MODES
