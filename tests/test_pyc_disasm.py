"""Validation of the 3.8-pyc disassembler (tools/pyc_disasm.py) against a
bytecode file whose SOURCE is checked into the reference, so the recovered
instruction stream can be compared with known code.

Ground truth: /root/reference/train_process/Trainer_baseline.py:206-208
    loss_seg1 = bceloss(torch.sigmoid(oS), target_map)
    loss_seg2 = mseloss(torch.sigmoid(boundaryS), target_boundary)
    loss_seg = loss_seg1 + loss_seg2
and the 7-tuple model_gen unpack at :203.

Skipped when the reference checkout isn't mounted.
"""

import io
import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

REF_PYC = "/root/reference/train_process/__pycache__/Trainer_baseline.cpython-38.pyc"

pytestmark = pytest.mark.skipif(
    not os.path.exists(REF_PYC), reason="reference checkout not mounted"
)


def _disassemble_func(name):
    import pyc_disasm

    top = pyc_disasm.load_pyc(REF_PYC)
    for co in pyc_disasm.iter_codes(top):
        if co.co_name == name:
            buf = io.StringIO()
            pyc_disasm.disassemble(co, buf)
            return co, buf.getvalue()
    raise AssertionError(f"{name} not found")


def test_unmarshal_code_metadata():
    import pyc_disasm

    top = pyc_disasm.load_pyc(REF_PYC)
    assert top.co_name == "<module>"
    names = [co.co_name for co in pyc_disasm.iter_codes(top)]
    # the class body and its known methods all round-trip
    for expected in ("Trainer", "__init__", "validate", "train_epoch", "train"):
        assert expected in names, names


def test_train_epoch_instruction_stream_matches_source():
    co, text = _disassemble_func("train_epoch")
    # 7-tuple unpack of the generator forward (source :203)
    assert "UNPACK_SEQUENCE              7" in text
    # BCE-on-sigmoid + MSE-on-sigmoid losses (source :206-207): the exact
    # call shape is LOAD_GLOBAL bceloss/mseloss; torch.sigmoid via
    # LOAD_METHOD sigmoid; two-arg CALL_FUNCTION
    assert "LOAD_GLOBAL                  bceloss" in text
    assert "LOAD_GLOBAL                  mseloss" in text
    assert text.count("LOAD_METHOD                  sigmoid") >= 2
    # loss_seg = loss_seg1 + loss_seg2 (source :208)
    i1 = text.index("LOAD_FAST                    loss_seg1")
    assert "BINARY_ADD" in text[i1:i1 + 200]
    # locals recovered correctly
    for v in ("imageS", "target_map", "target_boundary", "oS", "boundaryS"):
        assert v in co.co_varnames


def test_lnotab_lines_monotone_within_function():
    import pyc_disasm

    co, _ = _disassemble_func("train_epoch")
    starts = pyc_disasm._line_starts(co)
    # first instruction maps to the first statement, one past the def line
    # (a zero-addr-incr lnotab pair advances offset 0 off co_firstlineno)
    assert starts[0] == co.co_firstlineno + 1 == 179
    # lines are plausible file positions (train_epoch sits mid-file)
    assert 150 < co.co_firstlineno < 250
