"""Config secret encryption — AES-256-GCM with an SHA-256-derived key.

Parity with the reference's optional config decryption
(utils/decryption.go:20-95, flag protocol/root.go:147):

- empty/whitespace key → encryption disabled, ciphertext passes through
- key starting with ``arn:aws:kms:`` → delegate to AWS KMS (gated here:
  no AWS SDK in this environment, raises with a clear message)
- anything else → SHA-256(key) becomes the AES-256 key; the value is a
  JSON-encoded base64 string of nonce||ciphertext||tag (GCM standard
  nonce prefix, exactly the layout ``gcm.Seal(nonce, nonce, ...)`` emits)

The cipher is implemented from the public FIPS-197 (AES) and NIST
SP 800-38D (GCM) specifications — the stdlib has no AES, and config
secrets are bytes-sized so pure-Python throughput is irrelevant. The
implementation is validated against published NIST test vectors in
``tests/test_secrets.py``.
"""

from __future__ import annotations

import base64
import hashlib
import json
import os

__all__ = ["encrypt", "decrypt", "aes_gcm_seal", "aes_gcm_open"]


# -- AES block cipher (FIPS-197) --------------------------------------------

def _gf_mul(a: int, b: int) -> int:
    p = 0
    for _ in range(8):
        if b & 1:
            p ^= a
        hi = a & 0x80
        a = (a << 1) & 0xFF
        if hi:
            a ^= 0x1B
        b >>= 1
    return p


def _build_sbox() -> tuple[list[int], list[int]]:
    # multiplicative inverse in GF(2^8) + affine transform, computed rather
    # than transcribed (a typo'd table is the classic AES bug)
    inv = [0] * 256
    for x in range(1, 256):
        for y in range(1, 256):
            if _gf_mul(x, y) == 1:
                inv[x] = y
                break
    sbox = [0] * 256
    for x in range(256):
        b = inv[x]
        s = 0
        for i in range(8):
            bit = (
                (b >> i) ^ (b >> ((i + 4) % 8)) ^ (b >> ((i + 5) % 8))
                ^ (b >> ((i + 6) % 8)) ^ (b >> ((i + 7) % 8)) ^ (0x63 >> i)
            ) & 1
            s |= bit << i
        sbox[x] = s
    inv_sbox = [0] * 256
    for i, v in enumerate(sbox):
        inv_sbox[v] = i
    return sbox, inv_sbox


_SBOX, _INV_SBOX = _build_sbox()
_RCON = [0x01, 0x02, 0x04, 0x08, 0x10, 0x20, 0x40, 0x80, 0x1B, 0x36, 0x6C, 0xD8, 0xAB, 0x4D]


def _expand_key(key: bytes) -> list[list[int]]:
    nk = len(key) // 4
    nr = nk + 6
    words = [list(key[4 * i : 4 * i + 4]) for i in range(nk)]
    for i in range(nk, 4 * (nr + 1)):
        w = list(words[i - 1])
        if i % nk == 0:
            w = w[1:] + w[:1]
            w = [_SBOX[b] for b in w]
            w[0] ^= _RCON[i // nk - 1]
        elif nk > 6 and i % nk == 4:
            w = [_SBOX[b] for b in w]
        words.append([words[i - nk][j] ^ w[j] for j in range(4)])
    return [sum(words[4 * r : 4 * r + 4], []) for r in range(nr + 1)]


def _encrypt_block(block: bytes, round_keys: list[list[int]]) -> bytes:
    nr = len(round_keys) - 1
    # state s[r*4+c], loaded column-major from the block
    state = [0] * 16
    for c in range(4):
        for r in range(4):
            state[r * 4 + c] = block[4 * c + r]
    for c in range(4):
        for r in range(4):
            state[r * 4 + c] ^= round_keys[0][4 * c + r]
    for rnd in range(1, nr + 1):
        state = [_SBOX[b] for b in state]
        # ShiftRows
        state = [state[r * 4 + ((c + r) % 4)] for r in range(4) for c in range(4)]
        if rnd != nr:
            # MixColumns
            out = [0] * 16
            for c in range(4):
                col = [state[r * 4 + c] for r in range(4)]
                out[0 * 4 + c] = _gf_mul(col[0], 2) ^ _gf_mul(col[1], 3) ^ col[2] ^ col[3]
                out[1 * 4 + c] = col[0] ^ _gf_mul(col[1], 2) ^ _gf_mul(col[2], 3) ^ col[3]
                out[2 * 4 + c] = col[0] ^ col[1] ^ _gf_mul(col[2], 2) ^ _gf_mul(col[3], 3)
                out[3 * 4 + c] = _gf_mul(col[0], 3) ^ col[1] ^ col[2] ^ _gf_mul(col[3], 2)
            state = out
        for c in range(4):
            for r in range(4):
                state[r * 4 + c] ^= round_keys[rnd][4 * c + r]
    return bytes(state[r * 4 + c] for c in range(4) for r in range(4))


# -- GCM mode (NIST SP 800-38D) ---------------------------------------------

_R = 0xE1 << 120


def _ghash_mul(x: int, y: int) -> int:
    z = 0
    v = y
    for i in range(127, -1, -1):
        if (x >> i) & 1:
            z ^= v
        if v & 1:
            v = (v >> 1) ^ _R
        else:
            v >>= 1
    return z


def _ghash(h: int, aad: bytes, ct: bytes) -> bytes:
    def blocks(data: bytes):
        for i in range(0, len(data), 16):
            yield data[i : i + 16].ljust(16, b"\x00")

    y = 0
    for b in list(blocks(aad)) + list(blocks(ct)):
        y = _ghash_mul(y ^ int.from_bytes(b, "big"), h)
    lens = (len(aad) * 8).to_bytes(8, "big") + (len(ct) * 8).to_bytes(8, "big")
    y = _ghash_mul(y ^ int.from_bytes(lens, "big"), h)
    return y.to_bytes(16, "big")


def _ctr(round_keys, j0: bytes, data: bytes) -> bytes:
    out = bytearray()
    counter = int.from_bytes(j0, "big")
    for i in range(0, len(data), 16):
        counter = (counter & ~0xFFFFFFFF) | ((counter + 1) & 0xFFFFFFFF)
        ks = _encrypt_block(counter.to_bytes(16, "big"), round_keys)
        chunk = data[i : i + 16]
        out += bytes(a ^ b for a, b in zip(chunk, ks))
    return bytes(out)


def aes_gcm_seal(key: bytes, nonce: bytes, plaintext: bytes, aad: bytes = b"") -> bytes:
    """ciphertext||tag (the Go gcm.Seal layout, minus the nonce prefix)."""
    rk = _expand_key(key)
    h = int.from_bytes(_encrypt_block(b"\x00" * 16, rk), "big")
    if len(nonce) == 12:
        j0 = nonce + b"\x00\x00\x00\x01"
    else:
        j0 = _ghash(h, b"", nonce)  # non-96-bit IV path
    ct = _ctr(rk, j0, plaintext)
    tag_mask = _encrypt_block(j0, rk)
    tag = bytes(a ^ b for a, b in zip(_ghash(h, aad, ct), tag_mask))
    return ct + tag


def aes_gcm_open(key: bytes, nonce: bytes, sealed: bytes, aad: bytes = b"") -> bytes:
    if len(sealed) < 16:
        raise ValueError("ciphertext too short")
    ct, tag = sealed[:-16], sealed[-16:]
    rk = _expand_key(key)
    h = int.from_bytes(_encrypt_block(b"\x00" * 16, rk), "big")
    j0 = nonce + b"\x00\x00\x00\x01" if len(nonce) == 12 else _ghash(h, b"", nonce)
    tag_mask = _encrypt_block(j0, rk)
    want = bytes(a ^ b for a, b in zip(_ghash(h, aad, ct), tag_mask))
    # constant-time-ish compare (secrets are config-sized; good hygiene anyway)
    if len(want) != len(tag) or sum(a ^ b for a, b in zip(want, tag)) != 0:
        raise ValueError("failed to decrypt: authentication tag mismatch")
    return _ctr(rk, j0, ct)


# -- the reference's config-secret surface -----------------------------------

_NONCE_SIZE = 12


def _derive_key(secret_key: str) -> bytes | None:
    """Empty → disabled; KMS ARN → gated; else SHA-256(key)
    (decryption.go:20-37)."""
    if not secret_key or not secret_key.strip():
        return None
    if secret_key.startswith("arn:aws:kms:"):
        raise NotImplementedError(
            "KMS-managed keys need the AWS SDK, which is not available in "
            "this environment — use a local key string instead"
        )
    return hashlib.sha256(secret_key.encode()).digest()


def encrypt(plaintext: str, secret_key: str) -> str:
    """Plaintext → the JSON-wrapped base64(nonce||ct||tag) document the
    reference's Decrypt consumes. Disabled key returns the input as-is."""
    key = _derive_key(secret_key)
    if key is None:
        return plaintext
    nonce = os.urandom(_NONCE_SIZE)
    sealed = aes_gcm_seal(key, nonce, plaintext.encode())
    return json.dumps(base64.b64encode(nonce + sealed).decode())


def decrypt(encrypted_text: str, secret_key: str) -> str:
    """decryption.go:39-95 semantics: disabled key passes through, else
    unwrap JSON string → base64 → nonce||ct||tag → plaintext."""
    if not encrypted_text or not encrypted_text.strip():
        raise ValueError("cannot decrypt empty or whitespace-only input")
    key = _derive_key(secret_key)
    if key is None:
        return encrypted_text
    doc = json.loads(encrypted_text)
    if not isinstance(doc, str):
        raise ValueError("encrypted payload must be a JSON string")
    raw = base64.b64decode(doc)
    if len(raw) < _NONCE_SIZE:
        raise ValueError("ciphertext too short")
    return aes_gcm_open(key, raw[:_NONCE_SIZE], raw[_NONCE_SIZE:]).decode()
