"""Security algorithm conformance tests.

Vectors are the published 3GPP conformance test data:
- 128-NEA1/NIA1: TS 33.501 D.4.2/D.4.3, TS 35.217 (UEA2&UIA2 Document 4).
- 128-NEA2/NIA2: TS 33.401 C.1 (AES-CTR), RFC 4493-style CMAC per C.2.
- 128-NEA3/NIA3: EEA3/EIA3 Document 3 (ZUC conformance sets).

(The same sets appear in the reference's
tests/unittests/security/security_test.cpp.)
"""
import pytest

from srsran_project_23_5_tpu import security as sec


pytestmark = pytest.mark.skipif(not sec.available(),
                                reason="native crypto lib unavailable")


def b(hexstr: str) -> bytes:
    return bytes.fromhex(hexstr)


# --------------------------------------------------------------- 128-NEA1
NEA1_SETS = [
    # key, count, bearer, direction, length, plaintext, ciphertext
    ("D3C5D592327FB11C4035C6680AF8C6D1", 0x398A59B4, 0x15, 1, 253,
     "981BA6824C1BFB1AB485472029B71D808CE33E2CC3C0B5FC1F3DE8A6DC66B1F0",
     "5D5BFE75EB04F68CE0A12377EA00B37D47C6A0BA06309155086A859C4341B378"),
    ("0A8B6BD8D9B08B08D64E32D1817777FB", 0x544D49CD, 0x04, 0, 310,
     "FD40A41D370A1F65745095687D47BA1D36D2349E23F644392C8EA9C49D40C13271AFF264D0F248",
     "48148E5452A210C05F46BC80DC6F73495B02048C1B958B026102CA97280279A4C18D2EE308921C"),
    ("2BD6459F82C440E0952C49104805FF48", 0xC675A64B, 0x0C, 1, 798,
     "7EC61272743BF1614726446A6C38CED166F6CA76EB5430044286346CEF130F92"
     "922B03450D3A9975E5BD2EA0EB55AD8E1B199E3EC4316020E9A1B285E762795359B7BDFD39BEF4B2"
     "484583D5AFE082AEE638BF5FD5A606193901A08F4AB41AAB9B134880",
     "3F67850714B8DA69EFB727ED7A6C0C50714AD736C4F5600006E3525BE807C467"
     "C677FF864AF45FBA09C27CDE38F87A1F84D59AB255408F2C7B82F9EAD41A1FE65EABEBFBC1F3A4C5"
     "6C9A26FCF7B3D66D0220EE4775BC58170A2B12F3431D11B344D6E36C"),
]


@pytest.mark.parametrize("key,count,bearer,direction,length,pt,ct",
                         NEA1_SETS)
def test_nea1(key, count, bearer, direction, length, pt, ct):
    out = sec.nea1(b(key), count, bearer, direction, b(pt), length)
    assert out == b(ct)
    # stream cipher: applying again decrypts
    back = sec.nea1(b(key), count, bearer, direction, out, length)
    mask = 8 * len(b(pt)) - length
    assert back[:-1] == b(pt)[:-1]
    assert back[-1] == (b(pt)[-1] & (0xFF << mask)) & 0xFF


# --------------------------------------------------------------- 128-NIA1
NIA1_SETS = [
    (0x38A6F056, 0x1F, 0, "2bd6459f82c5b300952c49104881ff48", 88,
     "33323462633938613734790000000000", "731f1165"),
    (0x36AF6144, 0x18, 1, "7e5e94431e11d73828d739cc6ced4573", 254,
     "b3d3c9170a4e1632f60f861013d22d84b726b6a278d802d1eeaf1321ba5929dc",
     "e3259f6f"),
    (0xC7590EA9, 0x17, 0, "d3419be821087acd02123a9248033359", 511,
     "bbb057038809496bcff86d6fbc8ce5b135a06b166054f2d565be8ace75dc851e"
     "0bcdd8f07141c495872fb5d8c0c66a8b6da556663e4e461205d84580bee5bc7e",
     "9a16c77d"),
    (0x36AF6144, 0x0F, 1, "83fd23a244a74cf358da3019f1722635", 768,
     "35c68716633c66fb750c266865d53c11ea05b1e9fa49c8398d48e1efa5909d39"
     "47902837f5ae96d5a05bc8d61ca8dbef1b13a4b4abfe4fb1006045b674bb5472"
     "9304c382be53a5af05556176f6eaa2ef1d05e4b083181ee674cda5a485f74d7a",
     "bba74492"),
]


@pytest.mark.parametrize("count,bearer,direction,ik,length,msg,mac",
                         NIA1_SETS)
def test_nia1(count, bearer, direction, ik, length, msg, mac):
    out = sec.nia1(b(ik), count, bearer, direction, b(msg), length)
    assert out == b(mac)


# --------------------------------------------------------------- 128-NEA2
NEA2_SETS = [
    ("d3c5d592327fb11c4035c6680af8c6d1", 0x398A59B4, 0x15, 1, 253,
     "981ba6824c1bfb1ab485472029b71d808ce33e2cc3c0b5fc1f3de8a6dc66b1f0",
     "e9fed8a63d155304d71df20bf3e82214b20ed7dad2f233dc3c22d7bdeeed8e78"),
    ("0a8b6bd8d9b08b08d64e32d1817777fb", 0x544D49CD, 0x04, 0, 310,
     "fd40a41d370a1f65745095687d47ba1d36d2349e23f644392c8ea9c49d40c13271aff264d0f248",
     "75750d37b4bba2a4dedb34235bd68c6645acdaaca48138a3b0c471e2a7041a576423d2927287f0"),
]


@pytest.mark.parametrize("key,count,bearer,direction,length,pt,ct",
                         NEA2_SETS)
def test_nea2(key, count, bearer, direction, length, pt, ct):
    out = sec.nea2(b(key), count, bearer, direction, b(pt), length)
    assert out == b(ct)


# --------------------------------------------------------------- 128-NIA2
NIA2_SETS = [
    (0x38A6F056, 0x18, 0, "2bd6459f82c5b300952c49104881ff48", 58,
     "3332346263393840", "118c6eb8"),
    (0x398A59B4, 0x1A, 1, "d3c5d592327fb11c4035c6680af8c6d1", 64,
     "484583d5afe082ae", "b93787e6"),
    (0x36AF6144, 0x18, 1, "7e5e94431e11d73828d739cc6ced4573", 254,
     "b3d3c9170a4e1632f60f861013d22d84b726b6a278d802d1eeaf1321ba5929dc",
     "1f60b01d"),
    (0xC7590EA9, 0x17, 0, "d3419be821087acd02123a9248033359", 511,
     "bbb057038809496bcff86d6fbc8ce5b135a06b166054f2d565be8ace75dc851e"
     "0bcdd8f07141c495872fb5d8c0c66a8b6da556663e4e461205d84580bee5bc7e",
     "6846a2f0"),
]


@pytest.mark.parametrize("count,bearer,direction,ik,length,msg,mac",
                         NIA2_SETS)
def test_nia2(count, bearer, direction, ik, length, msg, mac):
    out = sec.nia2(b(ik), count, bearer, direction, b(msg), length)
    assert out == b(mac)


# --------------------------------------------------------------- 128-NEA3
NEA3_SETS = [
    ("173d14ba5003731d7a60049470f00a29", 0x66035492, 0xF, 0, 193,
     "6cf65340735552ab0c9752fa6f9025fe0bd675d9005875b200",
     "a6c85fc66afb8533aafc2518dfe784940ee1e4b030238cc800"),
]


@pytest.mark.parametrize("key,count,bearer,direction,length,pt,ct",
                         NEA3_SETS)
def test_nea3(key, count, bearer, direction, length, pt, ct):
    out = sec.nea3(b(key), count, bearer, direction, b(pt), length)
    assert out == b(ct)


# --------------------------------------------------------------- 128-NIA3
NIA3_SETS = [
    ("00000000000000000000000000000000", 0x0, 0x0, 0, 1,
     "00000000", "c8a9595e"),
    ("47054125561eb2dda94059da05097850", 0x561EB2DD, 0x14, 0, 90,
     "000000000000000000000000", "6719a088"),
    ("c9e6cec4607c72db000aefa88385ab0a", 0xA94059DA, 0x0A, 1, 577,
     "983b41d47d780c9e1ad11d7eb70391b1de0b35da2dc62f83e7b78d6306ca0ea0"
     "7e941b7be91348f9fcb170e2217fecd97f9f68adb16e5d7d21e569d280ed775c"
     "ebde3f4093c53881000000000000000000",
     "fae8ff0b"),
]


@pytest.mark.parametrize("key,count,bearer,direction,length,msg,mac",
                         NIA3_SETS)
def test_nia3(key, count, bearer, direction, length, msg, mac):
    out = sec.nia3(b(key), count, bearer, direction, b(msg), length)
    assert out == b(mac)


# ----------------------------------------------------------- AES & NEA0/NIA0
def test_aes128_fips197():
    # FIPS-197 Appendix C.1 example vector
    key = b("000102030405060708090a0b0c0d0e0f")
    pt = b("00112233445566778899aabbccddeeff")
    assert sec.aes128_encrypt_block(key, pt) == b(
        "69c4e0d86a7b0430d8cdb78070b4c55a")


def test_null_algorithms():
    data = b"\x01\x02\x03"
    assert sec.cipher(sec.CipheringAlgorithm.NEA0, b"\x00" * 16, 0, 0, 0,
                      data) == data
    assert sec.integrity_mac(sec.IntegrityAlgorithm.NIA0, b"\x00" * 16,
                             0, 0, 0, data) == b"\x00" * 4


def test_cipher_roundtrip_all_algos():
    key = bytes(range(16))
    data = bytes(range(64))
    for algo in (sec.CipheringAlgorithm.NEA1, sec.CipheringAlgorithm.NEA2,
                 sec.CipheringAlgorithm.NEA3):
        ct = sec.cipher(algo, key, 7, 3, 1, data)
        assert ct != data
        assert sec.cipher(algo, key, 7, 3, 1, ct) == data


def test_security_context_key_derivation():
    ctx = sec.SecurityContext(bytes(32))
    keys = {ctx.k_rrc_enc, ctx.k_rrc_int, ctx.k_up_enc, ctx.k_up_int}
    assert len(keys) == 4            # all distinct
    assert all(len(k) == 16 for k in keys)
    # deterministic
    ctx2 = sec.SecurityContext(bytes(32))
    assert ctx2.k_rrc_enc == ctx.k_rrc_enc
