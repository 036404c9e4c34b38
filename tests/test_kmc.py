"""KMC database format interop (io/kmc.py vs the reference reader's
byte-level semantics, src/KMC_reader.c)."""

import numpy as np

from turingassembler_tpu.io.kmc import read_kmc_database, write_kmc_database


def _random_sorted_kmers(n, k, seed=0):
    rng = np.random.default_rng(seed)
    codes = rng.integers(0, 4, (n * 2, k)).astype(np.uint8)
    # lexicographic sort + dedup (KMC order)
    v = np.ascontiguousarray(codes).view([("", np.uint8)] * k).ravel()
    order = np.argsort(v)
    codes = codes[order]
    v = v[order]
    keep = np.ones(len(v), bool)
    keep[1:] = v[1:] != v[:-1]
    codes = codes[keep][:n]
    counts = rng.integers(1, 1000, len(codes)).astype(np.int64)
    return codes, counts


def test_kmc_round_trip(tmp_path):
    k = 46  # the reference counts (k0+1)-mers, k0=45
    codes, counts = _random_sorted_kmers(5000, k, seed=1)
    path = str(tmp_path / "KMC_46_count")
    write_kmc_database(codes, counts, path)
    rcodes, rcounts, info = read_kmc_database(path)
    assert info["kmer_length"] == k
    assert info["total_kmers"] == len(codes)
    assert np.array_equal(rcodes, codes)
    assert np.array_equal(rcounts, counts)


def test_kmc_reference_reader_semantics(tmp_path):
    """Independent record walk following KMC_worker_multi line by line
    (KMC_reader.c:204-256): reverse suffix bytes into a little-endian
    kmer byte array, append prefix bytes, decode via fill_kmer_char."""
    import struct
    k = 30
    p = 6  # (30-6) % 4 == 0
    codes, counts = _random_sorted_kmers(800, k, seed=2)
    path = str(tmp_path / "KMC_30_count")
    write_kmc_database(codes, counts, path, lut_prefix_length=p)

    pre = open(path + ".kmc_pre", "rb").read()
    suf = open(path + ".kmc_suf", "rb").read()
    assert pre[:4] == b"KMCP" and pre[-4:] == b"KMCP"
    header_offset, = struct.unpack("<i", pre[-8:-4])
    kmer_type, = struct.unpack("<i", pre[-12:-8])
    assert kmer_type == 0
    body = np.frombuffer(pre[4:-12], "<u8")
    hdr = body[len(body) - header_offset // 8:]
    k_len = int(hdr[0] & 0xFFFFFFFF)
    counter_size = int(hdr[1] & 0xFFFFFFFF)
    lut_len = int(hdr[1] >> 32)
    total = int(hdr[3])
    assert (k_len, lut_len, total) == (k, p, len(codes))
    lut = body[: 4 ** p + 1]
    suffix_size = (k_len - lut_len) // 4
    rec_size = suffix_size + counter_size

    got = []
    pos = 4  # skip marker
    for prefix in range(4 ** p):
        n_kmers = int(lut[prefix + 1] - lut[prefix])
        for _ in range(n_kmers):
            rec = suf[pos : pos + rec_size]
            pos += rec_size
            # kmer[suffix_size - j - 1] = buf[j]  (KMC_reader.c:243-244)
            kmer = bytearray((k_len + 3) // 4)
            for j in range(suffix_size):
                kmer[suffix_size - j - 1] = rec[j]
            # KMC_add_prefix_kmer (KMC_reader.c:175-183)
            kk = suffix_size
            pref = prefix
            for _i in range((lut_len + 3) // 4):
                kmer[kk] = pref & 0xFF
                kk += 1
                pref >>= 8
            # fill_kmer_char over the whole array, MSB byte first
            chars = []
            nb = (k_len + 3) // 4
            for bi in range(nb - 1, -1, -1):
                b = kmer[bi]
                four = [(b >> 6) & 3, (b >> 4) & 3, (b >> 2) & 3, b & 3]
                chars.extend(four)
            chars = chars[len(chars) - k_len:] if False else chars[-k_len:] \
                if len(chars) > k_len else chars
            cnt, = struct.unpack("<I", rec[suffix_size:suffix_size + 4])
            got.append((chars[-k_len:], cnt))
    assert len(got) == total
    for (chars, cnt), row, c in zip(got, codes, counts):
        assert chars == list(row), (chars, list(row))
        assert cnt == c


def test_kmc2_variant_roundtrip(tmp_path):
    """kmer_type 0x200 (KMC2 layout): the reference reader's other
    branch (KMC_read_prefix, src/KMC_reader.c:50-74).  Writing it and
    reading it back must agree with the legacy kmer_type-0 parse of the
    same table."""
    import numpy as np

    from turingassembler_tpu.io.kmc import (read_kmc_database,
                                            write_kmc_database)

    rng = np.random.default_rng(3)
    k = 21
    n = 500
    codes = rng.integers(0, 4, (n, k)).astype(np.uint8)
    v = codes.view([("", np.uint8)] * k).ravel()
    codes = codes[np.argsort(v, kind="stable")]
    # dedupe rows (the DB is a set)
    keep = np.ones(n, bool)
    keep[1:] = (codes[1:] != codes[:-1]).any(axis=1)
    codes = codes[keep]
    counts = rng.integers(1, 200, len(codes)).astype(np.int64)

    p0 = str(tmp_path / "legacy")
    p2 = str(tmp_path / "kmc2")
    write_kmc_database(codes, counts, p0)
    write_kmc_database(codes, counts, p2, variant=0x200)
    c0, n0, i0 = read_kmc_database(p0)
    c2, n2, i2 = read_kmc_database(p2)
    assert np.array_equal(c0, c2)
    assert np.array_equal(n0, n2)
    assert np.array_equal(c2, codes)
    assert np.array_equal(n2, counts)
    assert i2["kmer_type"] == 0x200
    assert i2["kmer_length"] == i0["kmer_length"] == k
    assert i2["total_kmers"] == len(codes)
