"""Native (C++) data-path tests: parity with the python implementations."""
import numpy as np
import pytest

from procyon_tpu import native
from procyon_tpu.data import protein_tokenizer as pt


@pytest.fixture(scope="module")
def lib():
    if not native.available():
        pytest.skip("native library unavailable (no g++)")
    return native.get_lib()


class TestNativeTokenizer:
    def test_matches_python(self, lib):
        seqs = ["MKVLA", "GG", "A" * 25]
        nb = native.batch_encode(seqs, max_len=10)
        pb = pt.batch_encode(seqs, max_len=10)
        assert nb.tokens.shape == pb.tokens.shape
        np.testing.assert_array_equal(nb.tokens, pb.tokens)
        np.testing.assert_array_equal(nb.group_ids, pb.group_ids)
        np.testing.assert_array_equal(nb.row_valid, pb.row_valid)

    def test_truncate_mode(self, lib):
        nb = native.batch_encode(["A" * 30], max_len=10,
                                 long_strategy="truncate")
        pb = pt.batch_encode(["A" * 30], max_len=10,
                             long_strategy="truncate")
        np.testing.assert_array_equal(nb.tokens, pb.tokens)

    def test_unknown_residues(self, lib):
        nb = native.batch_encode(["MKJ*"], max_len=10)  # J, * unknown
        pb = pt.batch_encode(["MKJ*"], max_len=10)
        np.testing.assert_array_equal(nb.tokens, pb.tokens)

    def test_lowercase(self, lib):
        nb = native.batch_encode(["mkvla"], max_len=10)
        pb = pt.batch_encode(["mkvla"], max_len=10)
        np.testing.assert_array_equal(nb.tokens, pb.tokens)


class TestNativeMLM:
    def test_masking_properties(self, lib):
        b = pt.batch_encode(["MKVLAMKVLAMKVLAMKVLA"] * 8)
        masked, labels = native.mask_for_mlm(b.tokens, seed=42)
        sel = labels != -100
        assert sel.sum() > 0
        assert (masked[~sel] == b.tokens[~sel]).all()
        assert (labels[sel] == b.tokens[sel]).all()
        assert not np.isin(b.tokens[sel],
                           [pt.PAD_IDX, pt.CLS_IDX, pt.EOS_IDX]).any()

    def test_deterministic(self, lib):
        b = pt.batch_encode(["MKVLAMKVLA"] * 4)
        m1, l1 = native.mask_for_mlm(b.tokens, seed=7)
        m2, l2 = native.mask_for_mlm(b.tokens, seed=7)
        np.testing.assert_array_equal(m1, m2)
        m3, _ = native.mask_for_mlm(b.tokens, seed=8)
        assert not np.array_equal(m1, m3)


class TestFastaIndex:
    def test_roundtrip(self, lib, tmp_path):
        fa = tmp_path / "test.fa"
        fa.write_text(">p1\nMKVLA\nGGH\n>p2\nACDEF\n>p3\nWWWW\n")
        idx = native.FastaIndex(str(fa))
        assert len(idx) == 3
        assert idx.get(0) == "MKVLAGGH"
        assert idx.get(1) == "ACDEF"
        assert idx.get(2) == "WWWW"

    def test_python_fallback_matches(self, tmp_path):
        fa = tmp_path / "test.fa"
        fa.write_text(">a\nMK\n>b\nVL\n")
        idx = native.FastaIndex(str(fa))
        # force python path
        idx._native = False
        assert idx.get(0) == "MK"
        assert idx.get(1) == "VL"
