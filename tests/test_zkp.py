"""FHE witness recorder tests (zkp/fhe_witness.h analogue): record a
small gate circuit, build a witness, verify it, reject tampering,
replay a sampled gate."""

import numpy as np
import pytest

from fhe_tpu.tfhe import BinFheContext, Gate
from fhe_tpu.tfhe import zkp


@pytest.fixture(scope="module")
def circuit():
    ctx = BinFheContext.generate("TOY")
    rng = np.random.default_rng(17)
    sk = ctx.key_gen(rng)
    key = ctx.bt_key_gen(sk, rng)
    m1, m2 = np.array([1]), np.array([0])
    ct1 = ctx.encrypt(sk, m1, rng)
    ct2 = ctx.encrypt(sk, m2, rng)

    wb = zkp.WitnessBuilder("circ-test", security_parameter=8)
    i1 = wb.register_input(ct1)
    i2 = wb.register_input(ct2)
    ct3 = ctx.eval_bin_gate(key, Gate.AND, ct1, ct2)
    i3 = wb.record_gate(zkp.GateType.AND, [i1, i2], ct3)
    ct4 = ctx.eval_bin_gate(key, Gate.OR, ct1, ct2)
    i4 = wb.record_gate(zkp.GateType.OR, [i1, i2], ct4)
    ct5 = ctx.eval_bin_gate(key, Gate.XOR, ct3, ct4)
    i5 = wb.record_gate(zkp.GateType.XOR, [i3, i4], ct5)
    wb.mark_output(i5)
    return wb, wb.build()


def test_witness_verifies(circuit):
    wb, w = circuit
    assert zkp.WitnessVerifier().verify(w)
    assert w.num_gates == 6          # 2 inputs + 3 gates + 1 output marker
    assert w.num_ciphertexts == 5
    assert len(w.verification_points) == 3   # 3 real gates sampled


def test_witness_rejects_tampered_gate(circuit):
    wb, w = circuit
    import copy
    bad = copy.deepcopy(w)
    bad.verification_points[0].gate.type = zkp.GateType.OR \
        if bad.verification_points[0].gate.type != zkp.GateType.OR \
        else zkp.GateType.AND
    assert not zkp.WitnessVerifier().verify(bad)


def test_witness_rejects_wrong_root(circuit):
    wb, w = circuit
    import copy
    bad = copy.deepcopy(w)
    bad.ciphertext_root = bytes(32)
    assert not zkp.WitnessVerifier().verify(bad)


def test_commitment_opening(circuit):
    wb, w = circuit
    r = zkp.generate_randomness()
    c = zkp.commit(b"hello", r)
    assert zkp.CommitmentOpening(b"hello", r).verify(c)
    assert not zkp.CommitmentOpening(b"hellO", r).verify(c)


def test_gate_replay(circuit):
    wb, w = circuit
    vp = w.verification_points[0]
    openings = [wb.table.opening(i) for i in vp.gate.input_indices]
    out_op = wb.table.opening(vp.gate.output_index)
    ok = zkp.WitnessVerifier().verify_gate_recomputation(
        w, vp, lambda ins: out_op.committed_value, openings, out_op)
    assert ok
    bad = zkp.WitnessVerifier().verify_gate_recomputation(
        w, vp, lambda ins: b"not-the-output", openings, out_op)
    assert not bad
