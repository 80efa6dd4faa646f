import numpy as np

from smalt_tpu.seq import codec
from smalt_tpu.seq.refset import RefSet
from smalt_tpu.index.table import build_index


def _refset_from_strings(seqs):
    chunks = [codec.encode(s) for s in seqs]
    offsets = np.cumsum([0] + [len(c) for c in chunks]).astype(np.uint64)
    return RefSet(codes=np.concatenate(chunks), offsets=offsets,
                  names=[f"s{i}" for i in range(len(seqs))])


def _word(s):
    w = 0
    for ch in s:
        w = (w << 2) | "ACGT".index(ch)
    return np.uint64(w)


def test_sampling_positions():
    # one sequence, k=4, nskip=2: tuples at 0,2,4,... while window fits
    rs = _refset_from_strings([b"ACGTACGTAC"])  # len 10, last start 6
    idx = build_index(rs, 4, 2)
    # all sampled words
    got = {}
    for i, w in enumerate(idx.words):
        got[int(w)] = list(idx.pos[idx.starts[i]:idx.starts[i + 1]])
    assert got[int(_word("ACGT"))] == [0, 2]  # serial = offset//nskip
    assert got[int(_word("GTAC"))] == [1, 3]


def test_nonstd_windows_skipped():
    rs = _refset_from_strings([b"ACGTNACGTACG"])
    idx = build_index(rs, 4, 1)
    counts, slots = idx.lookup_counts(np.array([_word("ACGT")]))
    # windows containing N (positions 1..4) are skipped
    pos = idx.fetch_positions(int(slots[0]), int(counts[0]))
    assert list(pos) == [0, 5]


def test_multi_sequence_offsets():
    # second sequence starts at global offset 7; first tuple at next multiple
    # of nskip=4 that is >= 7, i.e. global 8
    rs = _refset_from_strings([b"ACGTACG", b"TTTTACGT"])
    idx = build_index(rs, 4, 4)
    counts, slots = idx.lookup_counts(np.array([_word("TTTA")]))
    assert counts[0] == 1
    assert list(idx.fetch_positions(int(slots[0]), int(counts[0]))) == [2]  # global 8 / 4


def test_lookup_miss():
    rs = _refset_from_strings([b"AAAAAAAA"])
    idx = build_index(rs, 4, 1)
    counts, slots = idx.lookup_counts(np.array([_word("ACGT")]))
    assert counts[0] == 0 and slots[0] == -1


def test_save_load(tmp_path, indexed):
    refset, idx = indexed
    pref = str(tmp_path / "t")
    idx.save(pref)
    from smalt_tpu.index.table import KmerIndex
    idx2 = KmerIndex.load(pref)
    assert idx2.wordlen == idx.wordlen and idx2.nskip == idx.nskip
    assert np.array_equal(idx2.words, idx.words)
    assert np.array_equal(idx2.pos, idx.pos)
