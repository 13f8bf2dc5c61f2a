"""Native C++ parser vs pure-Python parser: identical output on every input
shape (property test), and the build/fallback paths behave."""

import subprocess

import numpy as np
import pytest

from pprx.graph import native_io
from pprx.graph.io import load_edge_list

pytestmark = pytest.mark.skipif(
    not native_io.AVAILABLE, reason="native library not built (make -C native)"
)


def write(tmp_path, text):
    p = tmp_path / "g.txt"
    p.write_text(text)
    return str(p)


CASES = [
    "0 1\n1 2\n2 0\n",
    "# comment\n% other comment\n5 7 3.5\n7 5 1.0\n\n5 9 2.25\n",
    "1 2 9\n3 4\n",  # mixed ts / no-ts lines
    "  3   4  \n5\t6\n",  # odd whitespace
    "bogus line\n1 2\nx y z\n3 4\n",  # malformed lines skipped
    "",  # empty file
    "# only comments\n% here\n",
]


@pytest.mark.parametrize("text", CASES)
def test_native_matches_python(tmp_path, text):
    path = write(tmp_path, text)
    ns, nd, nn = load_edge_list(path, use_native=True)
    ps, pd, pn = load_edge_list(path, use_native=False)
    np.testing.assert_array_equal(ns, ps)
    np.testing.assert_array_equal(nd, pd)
    assert nn == pn


def test_native_large_random_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    m = 50_000
    src = rng.integers(0, 5000, m)
    dst = rng.integers(0, 5000, m)
    ts = rng.random(m)
    lines = [f"{s} {d} {t:.17g}" for s, d, t in zip(src, dst, ts)]
    path = write(tmp_path, "\n".join(lines) + "\n")
    ns, nd, nn = load_edge_list(path, use_native=True)
    ps, pd, pn = load_edge_list(path, use_native=False)
    np.testing.assert_array_equal(ns, ps)
    np.testing.assert_array_equal(nd, pd)
    assert nn == pn


def test_native_missing_file():
    with pytest.raises(RuntimeError, match="native edge parse failed"):
        native_io.parse_edgelist_raw("/nonexistent/file.txt")


def test_renumber_scatter_path_matches_unique_path():
    """The O(M)-scatter first-seen renumber (dense raw-id gate) must agree
    exactly with the sort-based np.unique path — including first-seen
    ordering with duplicates and gaps (round-4 IO fast path)."""
    from pprx.graph.io import renumber

    rng = np.random.default_rng(5)
    for trial in range(100):
        m = int(rng.integers(1, 80))
        hi = int(rng.integers(2, 10**5))
        src = rng.integers(0, hi, m)
        dst = rng.integers(0, hi, m)
        a = renumber(src, dst)
        off = 2**40  # push ids beyond the dense gate -> unique path
        b = renumber(src + off, dst + off)
        np.testing.assert_array_equal(a[0], b[0])
        np.testing.assert_array_equal(a[1], b[1])
        assert a[2] == b[2]
