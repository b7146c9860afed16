"""The reference's filter/crypto regression vectors
(tests/test_pdfminer_crypto.py there) asserted against our
implementations — ascii85/hex edge forms, RC4, LZW, RLE, AES unpadding
including false-padding robustness."""

import binascii

from pdfminer_six_spark.core.crypto import _unpad_aes, rc4
from pdfminer_six_spark.core.filters import (
    ascii85decode,
    asciihexdecode,
    lzwdecode,
    rldecode,
)


def test_ascii85():
    assert ascii85decode(b"9jqo^BlbD-BleB1DJ+*+F(f,q") == b"Man is distinguished"
    assert ascii85decode(b"E,9)oF*2M7/c~>") == b"pleasure."
    assert ascii85decode(b"zE,9)oF*2M7/c~>") == b"\0\0\0\0pleasure."
    assert ascii85decode(b"E,9)oF*2M7/c") == b"pleasure."
    assert ascii85decode(b"E,9)oF*2M7/c~") == b"pleasure."
    assert ascii85decode(b"<~E,9)oF*2M7/c~") == b"pleasure."
    assert ascii85decode(b"<~E,9)oF*2M7/c~\n>") == b"pleasure."
    assert (
        ascii85decode(b"<^BVT:K:=9<E)pd;BS_1:/aSV;ag~>") == b"VARIOUS UTTER NONSENSE"
    )
    assert (
        ascii85decode(b"<~<^BVT:K:=9<E)pd;BS_1:/aSV;ag~>")
        == b"VARIOUS UTTER NONSENSE"
    )
    assert (
        ascii85decode(b"<^BVT:K:=9<E)pd;BS_1:/aSV;ag~") == b"VARIOUS UTTER NONSENSE"
    )


def test_asciihex():
    assert asciihexdecode(b"61 62 2e6364   65") == b"ab.cde"
    assert asciihexdecode(b"61 62 2e6364   657>") == b"ab.cdep"
    assert asciihexdecode(b"7>") == b"p"


def test_rc4():
    assert binascii.hexlify(rc4(b"Key", b"Plaintext")) == b"bbf316e8d940af0ad3"
    assert binascii.hexlify(rc4(b"Wiki", b"pedia")) == b"1021bf0420"
    assert (
        binascii.hexlify(rc4(b"Secret", b"Attack at dawn"))
        == b"45a01f645fc35b383552544b9bf5"
    )


def test_lzw():
    assert (
        lzwdecode(b"\x80\x0b\x60\x50\x22\x0c\x0c\x85\x01")
        == b"\x2d\x2d\x2d\x2d\x2d\x41\x2d\x2d\x2d\x42"
    )


def test_rle():
    assert rldecode(b"\x05123456\xfa7\x04abcde\x80junk") == b"1234567777777abcde"


def test_unpad_aes():
    assert _unpad_aes(b"\x10" * 16) == b""
    assert _unpad_aes(b"0123456789abcdef" + b"\x10" * 16) == b"0123456789abcdef"
    assert _unpad_aes(b"0123456789abc\x03\x03\x03") == b"0123456789abc"
    assert (
        _unpad_aes(b"0123456789abcdef0123456789abc\x03\x03\x03")
        == b"0123456789abcdef0123456789abc"
    )
    assert _unpad_aes(b"foo\x01bar\x01bazquux\x01") == b"foo\x01bar\x01bazquux"
    # robust to false padding bytes (not valid pad runs)
    assert _unpad_aes(b"0123456789abc\x02\x03\x04") == b"0123456789abc\x02\x03\x04"
    assert _unpad_aes(b"0123456789abc\x05\x05\x05") == b"0123456789abc\x05\x05\x05"
