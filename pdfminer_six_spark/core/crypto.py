"""Encryption support (SURVEY.md §2.5 F9): PDF standard security handlers.

Implements the standard security handler key derivation and RC4 /
AES-128-CBC / AES-256-CBC decryption per ISO 32000 §7.6 (reference
semantics: pdfminer.six pdfdocument.py:335-670).  AES uses the public
``cryptography`` package when present; RC4 is implemented inline.
"""

from __future__ import annotations

import hashlib
import struct
from typing import Any, Dict, List, Optional

from pdfminer_six_spark.core.objects import (
    Name,
    bytes_value,
    dict_value,
    int_value,
    name_str,
)

try:
    from cryptography.hazmat.primitives.ciphers import Cipher, algorithms, modes

    _HAVE_CRYPTOGRAPHY = True
except Exception:  # pragma: no cover
    _HAVE_CRYPTOGRAPHY = False


class EncryptionError(Exception):
    pass


PASSWORD_PADDING = (
    b"(\xbfN^Nu\x8aAd\x00NV\xff\xfa\x01\x08..\x00\xb6\xd0h>\x80/\x0c"
    b"\xa9\xfedSiz"
)


def rc4(key: bytes, data: bytes) -> bytes:
    """RC4 stream cipher (public algorithm)."""
    S = list(range(256))
    j = 0
    klen = len(key)
    for i in range(256):
        j = (j + S[i] + key[i % klen]) & 0xFF
        S[i], S[j] = S[j], S[i]
    out = bytearray(len(data))
    i = j = 0
    for n, c in enumerate(data):
        i = (i + 1) & 0xFF
        j = (j + S[i]) & 0xFF
        S[i], S[j] = S[j], S[i]
        out[n] = c ^ S[(S[i] + S[j]) & 0xFF]
    return bytes(out)


def _require_aes() -> None:
    if not _HAVE_CRYPTOGRAPHY:
        raise EncryptionError("AES requires the 'cryptography' package")


def aes_cbc_decrypt(key: bytes, iv: bytes, data: bytes) -> bytes:
    _require_aes()
    dec = Cipher(algorithms.AES(key), modes.CBC(iv)).decryptor()
    return dec.update(data) + dec.finalize()


def aes_cbc_encrypt(key: bytes, iv: bytes, data: bytes) -> bytes:
    _require_aes()
    enc = Cipher(algorithms.AES(key), modes.CBC(iv)).encryptor()
    return enc.update(data) + enc.finalize()


def saslprep(data: str, prohibit_unassigned_code_points: bool = True) -> str:
    """RFC 4013 SASLprep for AES-256 r6 unicode passwords (ISO 32000-2
    §7.6.4.3.3 requires it; reference: pdfminer/_saslprep.py:30-120, same
    RFC realized over the stdlib stringprep tables).

    Map: non-ASCII spaces (C.1.2) -> SPACE, commonly-mapped-to-nothing
    (B.1) -> removed; normalize: NFKC under Unicode 3.2; prohibit: C.1.2,
    C.2.x, C.3-C.9 (+ A.1 for stored strings); bidi per RFC 3454 §6."""
    import stringprep
    import unicodedata

    if not data:
        return data
    prohibited = (
        stringprep.in_table_c12,
        stringprep.in_table_c21_c22,
        stringprep.in_table_c3,
        stringprep.in_table_c4,
        stringprep.in_table_c5,
        stringprep.in_table_c6,
        stringprep.in_table_c7,
        stringprep.in_table_c8,
        stringprep.in_table_c9,
    )
    if prohibit_unassigned_code_points:
        prohibited = (*prohibited, stringprep.in_table_a1)

    data = "".join(
        " " if stringprep.in_table_c12(ch) else ch
        for ch in data
        if not stringprep.in_table_b1(ch)
    )
    data = unicodedata.ucd_3_2_0.normalize("NFKC", data)
    if not data:
        return data

    if stringprep.in_table_d1(data[0]):
        if not stringprep.in_table_d1(data[-1]):
            raise EncryptionError("SASLprep: failed bidirectional check")
        prohibited = (*prohibited, stringprep.in_table_d2)
    else:
        prohibited = (*prohibited, stringprep.in_table_d1)

    for ch in data:
        if any(check(ch) for check in prohibited):
            raise EncryptionError("SASLprep: failed prohibited character check")
    return data


def _unpad_aes(plaintext: bytes) -> bytes:
    """Strip the PDF 1.7 §7.6.2 block pad (16 - M mod 16 bytes, each equal
    to the pad length) from decrypted object data; tolerate absent/invalid
    padding by returning the data unchanged (reference utils.py:858-878,
    issue 1122).  Only per-object decrypts unpad — key-derivation CBC
    passes (OE/UE) use the raw block output."""
    if not plaintext:
        return plaintext
    pad = plaintext[-1]
    if 0 < pad <= 16 and pad <= len(plaintext) and all(
        b == pad for b in plaintext[-pad:]
    ):
        return plaintext[:-pad]
    return plaintext


class SecurityHandler:
    """Revisions 2/3: RC4 with MD5 key derivation (V 1/2)."""

    supported_revisions = (2, 3)

    def __init__(self, docid: List[bytes], param: Dict[str, Any], password: str):
        self.docid = docid
        self.param = param
        self.init_params()
        if self.r not in self.supported_revisions:
            raise EncryptionError(f"unsupported revision {self.r}")
        self.decrypt_method = self.decrypt_rc4
        self.setup_cfm()
        self.key = self.authenticate(password)
        if self.key is None:
            raise EncryptionError("bad password")

    def init_params(self) -> None:
        p = self.param
        self.v = int_value(p.get("V", 0))
        self.r = int_value(p["R"])
        self.p_flags = struct.unpack(
            "<i", struct.pack("<I", int_value(p["P"]) & 0xFFFFFFFF)
        )[0]
        self.o = bytes_value(p["O"])
        self.u = bytes_value(p["U"])
        self.length = int_value(p.get("Length", 40))

    def setup_cfm(self) -> None:
        pass

    def is_extractable(self) -> bool:
        return bool(self.p_flags & 16)

    # --- algorithm 2: file encryption key from password ---
    def compute_encryption_key(self, password: bytes) -> bytes:
        padded = (password + PASSWORD_PADDING)[:32]
        h = hashlib.md5(padded)
        h.update(self.o)
        h.update(struct.pack("<i", self.p_flags))
        h.update(self.docid[0] if self.docid else b"")
        if self.r >= 4 and not self.param.get("EncryptMetadata", True):
            h.update(b"\xff\xff\xff\xff")
        key = h.digest()
        n = 5 if self.r == 2 else self.length // 8
        if self.r >= 3:
            for _ in range(50):
                key = hashlib.md5(key[:n]).digest()
        return key[:n]

    # --- algorithms 4/5: U value ---
    def compute_u(self, key: bytes) -> bytes:
        if self.r == 2:
            return rc4(key, PASSWORD_PADDING)
        h = hashlib.md5(PASSWORD_PADDING)
        h.update(self.docid[0] if self.docid else b"")
        result = rc4(key, h.digest())
        for i in range(1, 20):
            result = rc4(bytes(c ^ i for c in key), result)
        return result + result[:16]  # pad to 32

    def authenticate(self, password: str) -> Optional[bytes]:
        pwd = password.encode("latin1", "ignore")
        key = self.authenticate_user(pwd)
        if key is None:
            key = self.authenticate_owner(pwd)
        return key

    def authenticate_user(self, password: bytes) -> Optional[bytes]:
        key = self.compute_encryption_key(password)
        u = self.compute_u(key)
        ok = (u == self.u) if self.r == 2 else (u[:16] == self.u[:16])
        return key if ok else None

    def authenticate_owner(self, password: bytes) -> Optional[bytes]:
        # algorithm 3 inverse: recover the user password from O
        padded = (password + PASSWORD_PADDING)[:32]
        key = hashlib.md5(padded).digest()
        if self.r >= 3:
            for _ in range(50):
                key = hashlib.md5(key).digest()
        n = 5 if self.r == 2 else self.length // 8
        key = key[:n]
        if self.r == 2:
            user_password = rc4(key, self.o)
        else:
            user_password = self.o
            for i in range(19, -1, -1):
                user_password = rc4(bytes(c ^ i for c in key), user_password)
        return self.authenticate_user(user_password)

    # --- per-object decrypt ---
    def decrypt_rc4(self, objid: int, genno: int, data: bytes) -> bytes:
        key = (
            self.key
            + struct.pack("<L", objid or 0)[:3]
            + struct.pack("<L", genno or 0)[:2]
        )
        objkey = hashlib.md5(key).digest()[: min(len(key), 16)]
        return rc4(objkey, data)

    def decrypt_aes128(self, objid: int, genno: int, data: bytes) -> bytes:
        key = (
            self.key
            + struct.pack("<L", objid or 0)[:3]
            + struct.pack("<L", genno or 0)[:2]
            + b"sAlT"
        )
        objkey = hashlib.md5(key).digest()[: min(len(key) - 4, 16)]
        if len(data) < 16:
            return b""
        return _unpad_aes(aes_cbc_decrypt(objkey, data[:16], data[16:]))

    def decrypt_identity(self, objid: int, genno: int, data: bytes) -> bytes:
        return data

    def decrypt(self, objid, genno, data, attrs=None) -> bytes:
        if data is None:
            return data
        return self.decrypt_method(objid, genno, data)


class SecurityHandlerV4(SecurityHandler):
    """Revision 4: crypt filters select RC4 (V2), AES-128 (AESV2), or
    Identity per-stream family (we honor StmF/StrF jointly like the
    reference does in practice)."""

    supported_revisions = (4,)

    def init_params(self) -> None:
        super().init_params()
        self.length = 128
        self.cf = dict_value(self.param.get("CF"))
        stmf = self.param.get("StmF")
        self.stmf = name_str(stmf) if isinstance(stmf, Name) else "Identity"

    def setup_cfm(self) -> None:
        if self.stmf == "Identity":
            self.decrypt_method = self.decrypt_identity
            return
        filt = dict_value(self.cf.get(self.stmf))
        m = filt.get("CFM")
        mname = name_str(m) if isinstance(m, Name) else ""
        if mname == "AESV2":
            self.decrypt_method = self.decrypt_aes128
        elif mname == "V2":
            self.decrypt_method = self.decrypt_rc4
        else:
            self.decrypt_method = self.decrypt_identity


class SecurityHandlerV5(SecurityHandlerV4):
    """Revisions 5/6: AES-256; SHA-256 (r5) or hardened hash (r6)."""

    supported_revisions = (5, 6)

    def init_params(self) -> None:
        SecurityHandler.init_params(self)
        self.length = 256
        self.oe = bytes_value(self.param["OE"])
        self.ue = bytes_value(self.param["UE"])

    def setup_cfm(self) -> None:
        self.decrypt_method = self.decrypt_aes256

    def authenticate(self, password: str) -> Optional[bytes]:
        pwd = self._normalize_password(password)
        # owner first (salts per ISO 32000-2 §7.6.4.4.8)
        if self._pw_hash(pwd, self.o[32:40], self.u) == self.o[:32]:
            ikey = self._pw_hash(pwd, self.o[40:48], self.u)
            return aes_cbc_decrypt(ikey, b"\x00" * 16, self.oe)
        if self._pw_hash(pwd, self.u[32:40]) == self.u[:32]:
            ikey = self._pw_hash(pwd, self.u[40:48])
            return aes_cbc_decrypt(ikey, b"\x00" * 16, self.ue)
        return None

    def _normalize_password(self, password: str) -> bytes:
        if self.r == 6 and password:
            password = saslprep(password)
        return password.encode("utf-8")[:127]

    def _pw_hash(self, password: bytes, salt: bytes, vector: bytes = b"") -> bytes:
        if self.r == 5:
            return hashlib.sha256(password + salt + vector).digest()
        return self._r6_hash(password, salt[:8], vector)

    @staticmethod
    def _r6_hash(password: bytes, salt: bytes, vector: bytes = b"") -> bytes:
        # ISO 32000-2 algorithm 2.B
        k = hashlib.sha256(password + salt + vector).digest()
        hashes = (hashlib.sha256, hashlib.sha384, hashlib.sha512)
        round_no = last_byte = 0
        while round_no < 64 or last_byte > round_no - 32:
            k1 = (password + k + vector) * 64
            e = aes_cbc_encrypt(k[:16], k[16:32], k1)
            # first 16 bytes of e as unsigned int mod 3 (256 ≡ 1 mod 3)
            k = hashes[sum(b % 3 for b in e[:16]) % 3](e).digest()
            last_byte = e[-1]
            round_no += 1
        return k[:32]

    def decrypt_aes256(self, objid: int, genno: int, data: bytes) -> bytes:
        if len(data) < 16:
            return b""
        return _unpad_aes(aes_cbc_decrypt(self.key, data[:16], data[16:]))


_HANDLERS = {
    1: SecurityHandler,
    2: SecurityHandler,
    4: SecurityHandlerV4,
    5: SecurityHandlerV5,
}


def make_security_handler(docid, param, password: str):
    filt = param.get("Filter")
    if isinstance(filt, Name) and name_str(filt) != "Standard":
        return None
    factory = _HANDLERS.get(int_value(param.get("V", 0)))
    if factory is None:
        return None
    # propagates EncryptionError on failed authentication, like the
    # reference's PDFPasswordIncorrect (pdfdocument.py:757)
    return factory(docid, param, password)
