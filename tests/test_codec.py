import numpy as np

from smalt_tpu.seq import codec


def test_encode_standard():
    c = codec.encode(b"ACGTacgtU")
    assert list(codec.alpha(c) & 3)[:4] == [0, 1, 2, 3]
    assert list(codec.alpha(c) & 3)[4:8] == [0, 1, 2, 3]
    # U reads as T
    assert (c[8] & 7) == 3


def test_encode_nonstandard():
    c = codec.encode(b"NnXR-")
    a = codec.alpha(c)
    assert all(codec.is_nonstd(c))
    # letters in 'A'..'A'+30 keep their identity on decode
    assert codec.decode(c) == b"NNXRN"


def test_decode_roundtrip():
    s = b"ACGTNRYKMacgt"
    assert codec.decode(codec.encode(s)) == s.upper().replace(b"U", b"T")


def test_revcomp():
    c = codec.encode(b"ACGTN")
    rc = codec.revcomp_codes(c)
    assert codec.decode(rc) == b"NACGT"
    # double revcomp is identity
    assert codec.decode(codec.revcomp_codes(rc)) == b"ACGTN"


def test_complement_is_bitwise_not():
    for a in range(4):
        assert (~a) & 3 == [3, 2, 1, 0][a]
