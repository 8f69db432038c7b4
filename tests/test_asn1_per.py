"""X.691 PER engine: spec-vector checks, schema round-trips, AP-PDU codec.

Vectors are hand-derived from ITU-T X.691 clauses (cited per case);
the round-trip matrix covers both ALIGNED and UNALIGNED variants.
"""
import pytest

from srsran_project_23_5_tpu import asn1
from srsran_project_23_5_tpu.asn1 import schema as S
from srsran_project_23_5_tpu.asn1.per import BitReader, BitWriter, PerError


# ------------------------------------------------------------ primitives
def test_constrained_whole_unaligned_bitcounts():
    # §10.5.6: UNALIGNED uses ceil(log2(range)) bits
    w = BitWriter(aligned=False)
    w.constrained_whole(5, 0, 7)        # 3 bits: 101
    w.constrained_whole(1, 1, 1)        # range 1: 0 bits
    w.constrained_whole(254, 0, 254)    # 8 bits
    assert w.nof_bits == 11
    r = BitReader(w.to_bytes(), aligned=False)
    assert r.constrained_whole(0, 7) == 5
    assert r.constrained_whole(1, 1) == 1
    assert r.constrained_whole(0, 254) == 254


def test_constrained_whole_aligned_forms():
    # §10.5.7: range<=255 bit-field; =256 one octet aligned; <=64K two
    # totals after a 1-bit misalignment: range<=255 -> 8-bit bit-field
    # (no align, 9); range=256 -> align+1 octet (16); range<=64K ->
    # align+2 octets (24)
    for val, lb, ub, total in [(200, 0, 254, 9), (7, 0, 255, 16),
                               (1000, 0, 65535, 24)]:
        w = BitWriter(aligned=True)
        w.put_bit(1)                    # force misalignment
        w.constrained_whole(val, lb, ub)
        assert w.nof_bits == total, (val, ub, w.nof_bits)
        r = BitReader(w.to_bytes(), aligned=True)
        assert r.get_bit() == 1
        assert r.constrained_whole(lb, ub) == val


def test_length_determinant_general_form():
    # §10.9.3.6: <=127 one octet; §10.9.3.7: <16K two octets 10xxxxxx
    w = BitWriter(aligned=True)
    w.length_det(3)
    assert w.to_bytes() == b"\x03"
    w = BitWriter(aligned=True)
    w.length_det(130)
    assert w.to_bytes() == bytes([0x80 | 0, 130])
    w = BitWriter(aligned=True)
    w.length_det(16000)                 # 10xxxxxx xxxxxxxx, 14-bit count
    assert w.to_bytes() == bytes([0x80 | (16000 >> 8), 16000 & 0xFF])
    with pytest.raises(PerError):
        BitWriter(aligned=True).length_det(16384)


def test_normally_small():
    w = BitWriter(aligned=False)
    w.normally_small(5)                 # 0 + 6 bits
    assert w.nof_bits == 7
    r = BitReader(w.to_bytes(), aligned=False)
    assert r.normally_small() == 5
    w = BitWriter(aligned=True)
    w.normally_small(100)               # 1 + semi-constrained
    r = BitReader(w.to_bytes(), aligned=True)
    assert r.normally_small() == 100


def test_unconstrained_signed():
    for v in (0, 1, -1, 127, 128, -128, -129, 4096, -70000):
        w = BitWriter(aligned=True)
        w.unconstrained(v)
        assert BitReader(w.to_bytes(), aligned=True).unconstrained() == v


def test_octet_string_fragmentation():
    blob = bytes(range(256)) * 70  # 17920 >= 16K
    for aligned in (True, False):
        t = S.OctetString()
        enc = t.to_bytes(blob, aligned)
        assert t.from_bytes(enc, aligned) == blob


# ------------------------------------------------------------- schemas
@pytest.mark.parametrize("aligned", [True, False])
def test_sequence_optional_default_roundtrip(aligned):
    t = S.Sequence([
        S.Field("a", S.Integer(0, 15)),
        S.Field("b", S.Boolean(), optional=True),
        S.Field("c", S.Integer(0, 7), default=3),
        S.Field("d", S.OctetString(1, 4)),
    ])
    for v in ({"a": 9, "d": b"xy"},
              {"a": 0, "b": True, "c": 5, "d": b"abcd"}):
        out = t.from_bytes(t.to_bytes(v, aligned), aligned)
        expect = dict(v)
        expect.setdefault("c", 3)
        assert out == expect


@pytest.mark.parametrize("aligned", [True, False])
def test_sequence_extension_additions(aligned):
    base = S.Sequence([S.Field("a", S.Integer(0, 3))], ext=True)
    extd = S.Sequence([S.Field("a", S.Integer(0, 3))], ext=True,
                      ext_fields=[S.Field("x", S.Integer(0, 255)),
                                  S.Field("y", S.Boolean())])
    enc = extd.to_bytes({"a": 2, "y": False}, aligned)
    # a decoder knowing the additions recovers them
    assert extd.from_bytes(enc, aligned) == {"a": 2, "y": False}
    # a decoder NOT knowing the additions skips them (§18.9)
    assert base.from_bytes(enc, aligned) == {"a": 2}


@pytest.mark.parametrize("aligned", [True, False])
def test_choice_root_and_extension(aligned):
    t = S.Choice([("x", S.Integer(0, 7)), ("y", S.Boolean())], ext=True,
                 ext_alts=[("z", S.OctetString())])
    for v in (("x", 5), ("y", True), ("z", b"hello")):
        assert t.from_bytes(t.to_bytes(v, aligned), aligned) == v


@pytest.mark.parametrize("aligned", [True, False])
def test_bit_string_fixed_and_var(aligned):
    fixed = S.BitString(39, 39)
    v = (0x5A5A5A5A5A >> 1, 39)
    assert fixed.from_bytes(fixed.to_bytes(v, aligned), aligned) == v
    var = S.BitString(0, 160)
    for bits in [(0b101, 3), (0, 0), ((1 << 100) - 3, 130)]:
        assert var.from_bytes(var.to_bytes(bits, aligned), aligned) == bits


def test_enumerated_extension_unknown_value_skipped():
    t = S.Enumerated(["a", "b"], ext=True)
    enc = t.to_bytes("b", False)
    assert t.from_bytes(enc, False) == "b"


# ------------------------------------------------- AP-PDU message codec
def test_ap_pdu_roundtrip_and_framing():
    from srsran_project_23_5_tpu.ngap import NgSetupRequest
    msg = NgSetupRequest(gnb_id=17, ran_node_name="gnb-x", plmn=100101,
                         tac=99)
    data = asn1.encode(msg)
    # family octet + ALIGNED PER PDU: initiating arm, procedureCode,
    # criticality reject is the second octet's upper bits
    assert data[0] == 0x3                       # NGAP family
    out = asn1.decode(data)
    assert out == msg


def test_ap_pdu_unknown_proc_rejected():
    from srsran_project_23_5_tpu.ngap import NgSetupRequest
    data = bytearray(asn1.encode(NgSetupRequest()))
    data[0] = 0x7F                              # unknown family
    with pytest.raises(PerError):
        asn1.decode(bytes(data))


def test_ap_pdu_nested_and_lists():
    from srsran_project_23_5_tpu.ngap import (InitialContextSetupRequest,
                                              PduSessionResourceSetupRequest)
    m = PduSessionResourceSetupRequest(
        amf_ue_id=5, ran_ue_id=6,
        sessions=[[1, b"\x01\x02", "ip"], [2, b"", "ip2"]])
    assert asn1.decode(asn1.encode(m)) == m
    m2 = InitialContextSetupRequest(security_key=b"\xAA" * 32,
                                    pdu_sessions=[[1, 9, 100101]])
    assert asn1.decode(asn1.encode(m2)) == m2
