"""KATs + cross-implementation checks for the pure-Python BLAKE3 and
Ascon-Hash256 tier (datachecker_spark/hashes.py).

Ground truth: the reference's own integrity fixtures — the file
/root/reference/tests/integrity/ok contains the single byte b" " and its
sidecars ok.blake3 / ok.ascon256 (written by Zig's std.crypto, i.e. an
independent implementation of both algorithms) carry the digests below.

Tree-mode coverage: the fixture KAT only exercises the single-chunk path,
so this file carries an INDEPENDENT incremental BLAKE3 (the spec's
chunk-stack algorithm, written against the paper's pseudocode rather than
the recursive splitter the engine uses) and cross-checks the two across
chunk- and block-boundary lengths. Both share the compression function —
which the KAT pins — so a disagreement isolates tree/flag/counter bugs.
"""

from __future__ import annotations

from datachecker_spark.hashes import (
    _B3_BLOCK_LEN,
    _B3_CHUNK_END,
    _B3_CHUNK_LEN,
    _B3_CHUNK_START,
    _B3_IV,
    _B3_PARENT,
    _B3_ROOT,
    _b3_block_words,
    _b3_compress,
    PurePyHash,
    ascon_hash256_hex,
    blake3_ctor,
    blake3_hex,
)

# /root/reference/tests/integrity/ok.blake3 and ok.ascon256 (input b" ")
KAT_BLAKE3_SPACE = "00263ca9f57f7177f495e3711f8cdd59967a0a1a4de895b1ebee566cd1883ed4"
KAT_ASCON_SPACE = "3c609f1d3fbcdf04280bf695145fa1654fafce6a6035d61ff43cfe7050b2eeb4"


def test_blake3_reference_fixture_kat():
    assert blake3_hex(b" ") == KAT_BLAKE3_SPACE


def test_ascon_reference_fixture_kat():
    assert ascon_hash256_hex(b" ") == KAT_ASCON_SPACE


def test_hashlib_adapter_chunked_update():
    h = blake3_ctor()
    h.update(b" ")
    assert h.hexdigest() == KAT_BLAKE3_SPACE
    h2 = PurePyHash(ascon_hash256_hex)
    h2.update(b"")
    h2.update(b" ")
    assert h2.hexdigest() == KAT_ASCON_SPACE


# ---------------------------------------------------------------------------
# Independent incremental BLAKE3 (spec's chunk-stack algorithm)


def _blake3_incremental(data: bytes) -> str:
    """Byte-at-a-time-capable hasher following the BLAKE3 spec's reference
    pseudocode: a stack of completed-subtree chaining values merged by the
    trailing-zero rule of the completed-chunk count."""
    cv_stack: list[list[int]] = []

    def chunk_cv(chunk: bytes, counter: int) -> list[int]:
        blocks = [
            chunk[i : i + _B3_BLOCK_LEN]
            for i in range(0, len(chunk), _B3_BLOCK_LEN)
        ] or [b""]
        cv = list(_B3_IV)
        for i, blk in enumerate(blocks):
            flags = 0
            if i == 0:
                flags |= _B3_CHUNK_START
            if i == len(blocks) - 1:
                flags |= _B3_CHUNK_END
            cv = _b3_compress(
                cv, _b3_block_words(blk), counter, len(blk), flags
            )[:8]
        return cv

    chunks = [
        data[i : i + _B3_CHUNK_LEN] for i in range(0, len(data), _B3_CHUNK_LEN)
    ] or [b""]
    if len(chunks) == 1:
        # root is the single chunk: ROOT goes on its last block compression
        blocks = [
            chunks[0][i : i + _B3_BLOCK_LEN]
            for i in range(0, len(chunks[0]), _B3_BLOCK_LEN)
        ] or [b""]
        cv = list(_B3_IV)
        for i, blk in enumerate(blocks[:-1]):
            flags = _B3_CHUNK_START if i == 0 else 0
            cv = _b3_compress(cv, _b3_block_words(blk), 0, len(blk), flags)[:8]
        flags = (_B3_CHUNK_START if len(blocks) == 1 else 0) | _B3_CHUNK_END | _B3_ROOT
        out = _b3_compress(
            cv, _b3_block_words(blocks[-1]), 0, len(blocks[-1]), flags
        )
        return b"".join(w.to_bytes(4, "little") for w in out[:8]).hex()

    # every chunk but the last joins the stack (merging complete subtrees,
    # one merge per trailing zero of the completed-chunk count); the LAST
    # chunk stays pending so the root compression — wherever it lands — can
    # carry the ROOT flag
    for idx, chunk in enumerate(chunks[:-1]):
        cv = chunk_cv(chunk, idx)
        total = idx + 1
        while total % 2 == 0:
            left = cv_stack.pop()
            cv = _b3_compress(
                list(_B3_IV), left + cv, 0, _B3_BLOCK_LEN, _B3_PARENT
            )[:8]
            total //= 2
        cv_stack.append(cv)

    cv = chunk_cv(chunks[-1], len(chunks) - 1)
    while cv_stack:
        left = cv_stack.pop()
        flags = _B3_PARENT | (_B3_ROOT if not cv_stack else 0)
        out = _b3_compress(list(_B3_IV), left + cv, 0, _B3_BLOCK_LEN, flags)
        cv = out[:8]
    return b"".join(w.to_bytes(4, "little") for w in cv).hex()


def _pattern(n: int) -> bytes:
    # the official vectors' repeating input pattern (byte i = i mod 251)
    return bytes(i % 251 for i in range(n))


def test_blake3_tree_cross_implementation():
    lengths = [
        0, 1, 63, 64, 65, 127, 128, 1023, 1024, 1025, 2047, 2048, 2049,
        3072, 3073, 4096, 5000, 8192, 10000, 16384, 31744,
    ]
    for n in lengths:
        data = _pattern(n)
        assert blake3_hex(data) == _blake3_incremental(data), f"len={n}"


def test_blake3_distinct_across_lengths():
    seen = {blake3_hex(_pattern(n)) for n in range(0, 300)}
    assert len(seen) == 300


def test_ascon_padding_boundaries():
    # every residue mod the 8-byte rate, incl. the full-pad-block case
    digests = {ascon_hash256_hex(_pattern(n)) for n in range(0, 40)}
    assert len(digests) == 40
    for n in (7, 8, 9, 15, 16, 17):
        d = ascon_hash256_hex(_pattern(n))
        assert len(d) == 64
        # deterministic
        assert d == ascon_hash256_hex(_pattern(n))


def test_integrity_dispatch_covers_blake3_ascon():
    from datachecker_spark.constraints.integrity import (
        REFERENCE_ALGOS,
        SUPPORTED_ALGOS,
        hashlib_digest,
    )

    assert set(REFERENCE_ALGOS) <= set(SUPPORTED_ALGOS)
    assert hashlib_digest("blake3", b" ") == KAT_BLAKE3_SPACE
    assert hashlib_digest("ascon256", b" ") == KAT_ASCON_SPACE
