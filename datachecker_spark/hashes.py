"""Pure-Python BLAKE3 and Ascon-Hash256 — the two reference integrity
algorithms with no hashlib/JVM implementation (reference dispatch map
/root/reference/src/modules/integrity.zig:46-73 uses Zig's
std.crypto.hash.Blake3 and std.crypto.hash.ascon.AsconHash256).

Both are implemented from their public specifications:

* BLAKE3 — the BLAKE3 paper/spec (O'Connor, Aumasson, Neves, Wilcox-O'Hearn,
  2020): 7-round BLAKE2s-style compression over 64-byte blocks, 1024-byte
  chunks as leaves of a binary Merkle tree whose left subtree always holds
  the largest power-of-two number of chunks that leaves ≥1 byte on the
  right, PARENT nodes compressing left_cv||right_cv, ROOT flag on the final
  compression only.
* Ascon-Hash256 — NIST SP 800-232 (2025): 320-bit state, 12-round
  permutation for init/absorb/squeeze, 64-bit rate sponge, little-endian
  word loads, 0x01 byte padding, 256-bit output.

KAT anchor: the reference's own fixtures
(/root/reference/tests/integrity/ok.blake3, ok.ascon256 — digests of the
one-byte file b" ") pin byte order, IV, flag handling and padding; the
pytest suite additionally cross-checks the BLAKE3 tree builder against an
independent incremental (chunk-stack) implementation across chunk-boundary
lengths.

Performance note: these are the SLOW fallback tier — interpreted Python at
roughly 0.5 MB/s, used only for expectation rows whose algo is blake3 /
ascon256 when no native wheel is importable (`integrity.py` prefers the
`blake3` wheel when present). The hot integrity tier (xxhash64/sha2) stays
in whole-stage codegen; the hashlib tier is OpenSSL C. That split is the
scale story; this module is completeness, not throughput.
"""

from __future__ import annotations

_M32 = 0xFFFFFFFF

# ---------------------------------------------------------------------------
# BLAKE3

_B3_IV = (
    0x6A09E667, 0xBB67AE85, 0x3C6EF372, 0xA54FF53A,
    0x510E527F, 0x9B05688C, 0x1F83D9AB, 0x5BE0CD19,
)
_B3_MSG_PERM = (2, 6, 3, 10, 7, 0, 4, 13, 1, 11, 12, 5, 9, 14, 15, 8)
_B3_CHUNK_LEN = 1024
_B3_BLOCK_LEN = 64
_B3_CHUNK_START = 1
_B3_CHUNK_END = 2
_B3_PARENT = 4
_B3_ROOT = 8


def _b3_compress(cv, m, counter, block_len, flags):
    """One BLAKE3 compression; returns the full 16-word output state."""
    v = [
        cv[0], cv[1], cv[2], cv[3], cv[4], cv[5], cv[6], cv[7],
        _B3_IV[0], _B3_IV[1], _B3_IV[2], _B3_IV[3],
        counter & _M32, (counter >> 32) & _M32, block_len, flags,
    ]
    m = list(m)

    def g(a, b, c, d, mx, my):
        va = (v[a] + v[b] + mx) & _M32
        vd = v[d] ^ va
        vd = ((vd >> 16) | (vd << 16)) & _M32
        vc = (v[c] + vd) & _M32
        vb = v[b] ^ vc
        vb = ((vb >> 12) | (vb << 20)) & _M32
        va = (va + vb + my) & _M32
        vd ^= va
        vd = ((vd >> 8) | (vd << 24)) & _M32
        vc = (vc + vd) & _M32
        vb ^= vc
        vb = ((vb >> 7) | (vb << 25)) & _M32
        v[a], v[b], v[c], v[d] = va, vb, vc, vd

    for rnd in range(7):
        g(0, 4, 8, 12, m[0], m[1])
        g(1, 5, 9, 13, m[2], m[3])
        g(2, 6, 10, 14, m[4], m[5])
        g(3, 7, 11, 15, m[6], m[7])
        g(0, 5, 10, 15, m[8], m[9])
        g(1, 6, 11, 12, m[10], m[11])
        g(2, 7, 8, 13, m[12], m[13])
        g(3, 4, 9, 14, m[14], m[15])
        if rnd < 6:
            m = [m[p] for p in _B3_MSG_PERM]
    return [v[i] ^ v[i + 8] for i in range(8)] + [
        v[i + 8] ^ cv[i] for i in range(8)
    ]


def _b3_block_words(block: bytes):
    block = block.ljust(_B3_BLOCK_LEN, b"\x00")
    return [
        int.from_bytes(block[4 * i : 4 * i + 4], "little") for i in range(16)
    ]


def _b3_chunk_output(chunk: bytes, chunk_counter: int):
    """(cv_in, last_block_words, counter, block_len, flags) for one chunk —
    the final compression is deferred so the caller can add ROOT."""
    blocks = [
        chunk[i : i + _B3_BLOCK_LEN]
        for i in range(0, len(chunk), _B3_BLOCK_LEN)
    ] or [b""]
    cv = list(_B3_IV)
    for i, blk in enumerate(blocks[:-1]):
        flags = _B3_CHUNK_START if i == 0 else 0
        cv = _b3_compress(
            cv, _b3_block_words(blk), chunk_counter, _B3_BLOCK_LEN, flags
        )[:8]
    flags = (_B3_CHUNK_START if len(blocks) == 1 else 0) | _B3_CHUNK_END
    return (
        cv,
        _b3_block_words(blocks[-1]),
        chunk_counter,
        len(blocks[-1]),
        flags,
    )


def _b3_left_chunks(n_chunks: int) -> int:
    """Largest power of two strictly less than n_chunks (spec's left-subtree
    rule: the left side is always a complete subtree)."""
    p = 1
    while p * 2 < n_chunks:
        p *= 2
    return p


def _b3_node_output(data: bytes, chunk_start: int):
    n_chunks = max(1, (len(data) + _B3_CHUNK_LEN - 1) // _B3_CHUNK_LEN)
    if n_chunks == 1:
        return _b3_chunk_output(data, chunk_start)
    left_chunks = _b3_left_chunks(n_chunks)
    split = left_chunks * _B3_CHUNK_LEN
    lo = _b3_node_output(data[:split], chunk_start)
    ro = _b3_node_output(data[split:], chunk_start + left_chunks)
    left_cv = _b3_compress(*lo)[:8]
    right_cv = _b3_compress(*ro)[:8]
    return (list(_B3_IV), left_cv + right_cv, 0, _B3_BLOCK_LEN, _B3_PARENT)


def blake3_hex(data: bytes) -> str:
    """32-byte BLAKE3 digest, hex. One-shot over in-memory bytes (the
    engine hashes canonical span strings, never multi-GB streams)."""
    cv, block, counter, block_len, flags = _b3_node_output(data, 0)
    out = _b3_compress(cv, block, counter, block_len, flags | _B3_ROOT)
    return b"".join(w.to_bytes(4, "little") for w in out[:8]).hex()


# ---------------------------------------------------------------------------
# Ascon-Hash256 (NIST SP 800-232)

_M64 = (1 << 64) - 1
_ASCON_RC = (0xF0, 0xE1, 0xD2, 0xC3, 0xB4, 0xA5, 0x96, 0x87, 0x78, 0x69, 0x5A, 0x4B)
# SP 800-232 §5: IV encodes (version, rounds, rate, tag length, algorithm id)
_ASCON_HASH256_IV = 0x0000080100CC0002


def _ascon_p12(s):
    x0, x1, x2, x3, x4 = s
    for rc in _ASCON_RC:
        x2 ^= rc
        # substitution layer (bitsliced 5-bit S-box)
        x0 ^= x4
        x4 ^= x3
        x2 ^= x1
        t0 = (x0 ^ _M64) & x1
        t1 = (x1 ^ _M64) & x2
        t2 = (x2 ^ _M64) & x3
        t3 = (x3 ^ _M64) & x4
        t4 = (x4 ^ _M64) & x0
        x0 ^= t1
        x1 ^= t2
        x2 ^= t3
        x3 ^= t4
        x4 ^= t0
        x1 ^= x0
        x0 ^= x4
        x3 ^= x2
        x2 ^= _M64
        # linear diffusion layer
        x0 ^= ((x0 >> 19) | (x0 << 45)) & _M64 ^ ((x0 >> 28) | (x0 << 36)) & _M64
        x1 ^= ((x1 >> 61) | (x1 << 3)) & _M64 ^ ((x1 >> 39) | (x1 << 25)) & _M64
        x2 ^= ((x2 >> 1) | (x2 << 63)) & _M64 ^ ((x2 >> 6) | (x2 << 58)) & _M64
        x3 ^= ((x3 >> 10) | (x3 << 54)) & _M64 ^ ((x3 >> 17) | (x3 << 47)) & _M64
        x4 ^= ((x4 >> 7) | (x4 << 57)) & _M64 ^ ((x4 >> 41) | (x4 << 23)) & _M64
    return [x0, x1, x2, x3, x4]


def ascon_hash256_hex(data: bytes) -> str:
    """Ascon-Hash256 (SP 800-232): 64-bit-rate sponge, P12 everywhere,
    little-endian loads, 0x01 || 0* padding, 256-bit digest."""
    s = _ascon_p12([_ASCON_HASH256_IV, 0, 0, 0, 0])
    padded = data + b"\x01" + b"\x00" * (7 - (len(data) % 8))
    for i in range(0, len(padded), 8):
        s[0] ^= int.from_bytes(padded[i : i + 8], "little")
        s = _ascon_p12(s)
    out = bytearray()
    for i in range(4):
        if i:
            s = _ascon_p12(s)
        out += s[0].to_bytes(8, "little")
    return bytes(out).hex()


class PurePyHash:
    """Minimal hashlib-shaped adapter so these register in the integrity
    dispatch exactly like hashlib constructors."""

    __slots__ = ("_buf", "_fn")

    def __init__(self, fn):
        self._buf = bytearray()
        self._fn = fn

    def update(self, data: bytes) -> None:
        self._buf += data

    def hexdigest(self) -> str:
        return self._fn(bytes(self._buf))


def blake3_ctor() -> PurePyHash:
    return PurePyHash(blake3_hex)


def ascon256_ctor() -> PurePyHash:
    return PurePyHash(ascon_hash256_hex)
