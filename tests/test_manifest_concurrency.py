"""Concurrent manifest commits: the os.link version claim + commit()'s
read-mutate-retry loop must serialize genuinely concurrent committers —
all records land, none clobbered (reference parity: process-level
fragment commit atomicity, ``/root/reference/tiledb/fragment.py``)."""

import errno
import threading

import pandas as pd
import pytest

import tiledb_py_spark as tdb
from tiledb_py_spark import manifest as mf
from tiledb_py_spark.manifest import FragmentRecord


@pytest.fixture
def uri(tmp_path):
    u = str(tmp_path / "arr")
    pdf = pd.DataFrame({"k": range(4), "v": [1.0, 2.0, 3.0, 4.0]})
    tdb.from_pandas(u, pdf, index_dims=["k"], full_domain=True)
    return u


def _rec(tag, i):
    return FragmentRecord(name=f"frag_cc_{tag}_{i}", timestamp_range=(i, i),
                          cell_num=1, nonempty_domain={"k": [i, i]})


def test_concurrent_commits_all_land(uri):
    """Two threads commit 8 fragments each through commit(); every one
    of the 16 records must land with a distinct manifest version — a
    lost record (the pre-r11 check+rename race) = orphaned data."""
    v0 = mf.read_manifest(uri).version
    n_each = 8
    barrier = threading.Barrier(2)
    errors = []

    def worker(tag):
        try:
            barrier.wait()
            for i in range(n_each):
                r = _rec(tag, i)
                mf.commit(uri, lambda man, r=r: man.fragments.append(r))
        except Exception as e:  # pragma: no cover - failure reporting
            errors.append(e)

    threads = [threading.Thread(target=worker, args=(t,)) for t in "ab"]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors
    m = mf.read_manifest(uri)
    names = [f.name for f in m.fragments if f.name.startswith("frag_cc_")]
    assert sorted(names) == sorted(f"frag_cc_{t}_{i}"
                                   for t in "ab" for i in range(n_each))
    # exactly one version per commit — interleaved, never skipped/reused
    assert m.version == v0 + 2 * n_each


def test_write_manifest_duplicate_version_refused(uri):
    m = mf.read_manifest(uri)
    with pytest.raises(FileExistsError):
        mf.write_manifest(uri, m)  # same version already committed


def test_commit_without_hardlink_support(uri, monkeypatch):
    """Filesystems without hardlinks (NFS mounts, FUSE, FAT) raise
    EPERM/ENOTSUP from os.link; the claim must fall back to the
    O_CREAT|O_EXCL path instead of surfacing an unrelated OSError
    (r11 ADVICE)."""
    real_link = mf.os.link

    def no_link(src, dst, **kw):
        raise OSError(errno.ENOTSUP, "hard links not supported")

    monkeypatch.setattr(mf.os, "link", no_link)
    r = _rec("nolink", 0)
    mf.commit(uri, lambda man: man.fragments.append(r))
    m = mf.read_manifest(uri)
    assert any(f.name == "frag_cc_nolink_0" for f in m.fragments)
    # the fallback claim is still a claim: duplicate version refused
    with pytest.raises(FileExistsError):
        mf.write_manifest(uri, m)
    monkeypatch.setattr(mf.os, "link", real_link)
