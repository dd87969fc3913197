"""Symmetric encryption for AVSS payloads (reference symmetric_crypto.py:
AES-CBC with a SHA-256-derived key over pickled payloads). Uses AES-CTR +
HMAC from the `cryptography` package; key derivation matches the
reference's hash-the-shared-point approach."""

from __future__ import annotations

import hashlib
import hmac
import os
import pickle

from cryptography.hazmat.primitives.ciphers import Cipher, algorithms, modes


def _derive(key_material) -> bytes:
    if not isinstance(key_material, bytes):
        key_material = pickle.dumps(key_material)
    return hashlib.sha256(key_material).digest()


def encrypt(key_material, plaintext_obj) -> bytes:
    """pickle + AES-256-CTR + HMAC-SHA256 (encrypt-then-mac)."""
    key = _derive(key_material)
    nonce = os.urandom(16)
    data = pickle.dumps(plaintext_obj)
    enc = Cipher(algorithms.AES(key), modes.CTR(nonce)).encryptor()
    ct = enc.update(data) + enc.finalize()
    mac = hmac.new(key, nonce + ct, hashlib.sha256).digest()
    return nonce + ct + mac


def decrypt(key_material, blob: bytes):
    """Raises ValueError on tampering."""
    key = _derive(key_material)
    nonce, ct, mac = blob[:16], blob[16:-32], blob[-32:]
    if not hmac.compare_digest(
            hmac.new(key, nonce + ct, hashlib.sha256).digest(), mac):
        raise ValueError("MAC verification failed")
    dec = Cipher(algorithms.AES(key), modes.CTR(nonce)).decryptor()
    return pickle.loads(dec.update(ct) + dec.finalize())
