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


def test_concurrent_commits_two_processes(uri, tmp_path):
    """Two PROCESSES x 8 commits: the os.link/O_EXCL claim is kernel-
    level, so the interleaving must stay gap-free without the GIL's
    accidental serialization (VERDICT r12 item 8).  Same invariants as
    the thread test: all 16 records land, one version per commit."""
    import os
    import subprocess
    import sys

    v0 = mf.read_manifest(uri).version
    n_each = 8
    go = str(tmp_path / "go")
    script = (
        "import sys, os, time\n"
        "sys.path.insert(0, sys.argv[4])\n"
        "from tiledb_py_spark import manifest as mf\n"
        "from tiledb_py_spark.manifest import FragmentRecord\n"
        "uri, tag, go = sys.argv[1], sys.argv[2], sys.argv[3]\n"
        "while not os.path.exists(go):\n"
        "    time.sleep(0.001)\n"
        "for i in range(%d):\n"
        "    r = FragmentRecord(name=f'frag_pp_{tag}_{i}',\n"
        "                       timestamp_range=(i, i), cell_num=1,\n"
        "                       nonempty_domain={'k': [i, i]})\n"
        "    mf.commit(uri, lambda man, r=r: man.fragments.append(r))\n"
        % n_each)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    procs = [subprocess.Popen([sys.executable, "-c", script, uri, tag,
                               go, repo],
                              stdout=subprocess.PIPE,
                              stderr=subprocess.PIPE)
             for tag in "ab"]
    open(go, "w").close()
    for p in procs:
        _, err = p.communicate(timeout=120)
        assert p.returncode == 0, err.decode()
    m = mf.read_manifest(uri)
    names = [f.name for f in m.fragments if f.name.startswith("frag_pp_")]
    assert sorted(names) == sorted(f"frag_pp_{t}_{i}"
                                   for t in "ab" for i in range(n_each))
    assert m.version == v0 + 2 * n_each


def test_consolidate_vs_writer_two_processes(uri, tmp_path, spark):
    """Two PROCESSES: one consolidating+vacuuming in a loop, one
    committing fragments (VERDICT r13 item 3).  Invariants under every
    interleaving: no committed row is lost (vacuum must never rmtree a
    fragment whose manifest record is live — the r14 ever-set snapshot
    fix), and no deleted row resurrects through a consolidation product.

    Two phases, barrier-synced by marker files so both orders are
    exercised deterministically: (1) LOCKSTEP — each commit is followed
    by exactly one consolidate+vacuum before the next commit (commit →
    fold → GC); (2) CONCURRENT BURST — the writer commits 12 fragments
    flat-out while the consolidator runs 4 consolidate+vacuum cycles
    (the cross-process window the in-process monkeypatch replay in
    test_review_r14.py cannot reach)."""
    import os
    import subprocess
    import sys

    # rows 0..3 exist (fixture); delete two so resurrection is testable
    with tdb.open(uri, "d", spark=spark) as D:
        D.query(cond="v <= 2.0").submit()   # drops k=0 (v=1.0), k=1 (v=2.0)

    sync = str(tmp_path / "sync")
    os.makedirs(sync)
    n_lock, n_burst, n_cons = 6, 12, 4
    common = (
        "import sys, os, time\n"
        "sys.path.insert(0, sys.argv[2])\n"
        "uri, sync = sys.argv[1], sys.argv[3]\n"
        "def wait(name, t=180):\n"
        "    p = os.path.join(sync, name); t0 = time.time()\n"
        "    while not os.path.exists(p):\n"
        "        assert time.time() - t0 < t, f'barrier timeout: {name}'\n"
        "        time.sleep(0.01)\n"
        "def touch(name):\n"
        "    open(os.path.join(sync, name), 'w').close()\n")
    writer = common + (
        "import pandas as pd\n"
        "from tiledb_py_spark import manifest as mf\n"
        "from tiledb_py_spark.sources.fragment_writer import"
        " write_fragment_pandas\n"
        "schema = mf.read_manifest(uri).schema\n"
        "def commit_row(k):\n"
        "    write_fragment_pandas(uri, schema, pd.DataFrame(\n"
        "        {'k': [k], 'v': [float(k)]}))\n"
        f"for i in range({n_lock}):\n"
        "    if i: wait(f'c{i-1}.done')\n"
        "    commit_row(1000 + i)\n"
        "    touch(f'w{i}.done')\n"
        "wait('burst.go')\n"
        f"for i in range({n_burst}):\n"
        "    commit_row(2000 + i)\n"
        "touch('writer.done')\n")
    consolidator = common + (
        "import tiledb_py_spark as tdb\n"
        "spark = tdb.get_spark(cpus='4')\n"
        "spark.sparkContext.setLogLevel('ERROR')\n"
        f"for i in range({n_lock}):\n"
        "    wait(f'w{i}.done')\n"
        "    tdb.consolidate(uri, spark=spark)\n"
        "    tdb.vacuum(uri)\n"
        "    touch(f'c{i}.done')\n"
        "touch('burst.go')\n"
        f"for i in range({n_cons}):\n"
        "    tdb.consolidate(uri, spark=spark)\n"
        "    tdb.vacuum(uri)\n"
        "wait('writer.done')\n"
        "tdb.consolidate(uri, spark=spark)\n"
        "tdb.vacuum(uri)\n")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    procs = [subprocess.Popen(
        [sys.executable, "-c", s, uri, repo, sync],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE)
        for s in (writer, consolidator)]
    for p, tag in zip(procs, ("writer", "consolidator")):
        _, err = p.communicate(timeout=420)
        assert p.returncode == 0, f"{tag} failed:\n{err.decode()[-4000:]}"

    m = mf.read_manifest(uri)
    # every live fragment's data directory survived vacuum
    for f in m.fragments:
        if f.superseded_by is None:
            assert os.path.isdir(mf.fragment_path(uri, f)), \
                f"vacuum destroyed live fragment {f.name}"
    res = tdb.open(uri, spark=spark).df[:]
    ks = sorted(res.index.tolist())
    want = sorted(list(range(2, 4)) + [1000 + i for i in range(n_lock)]
                  + [2000 + i for i in range(n_burst)])
    lost = set(want) - set(ks)
    assert not lost, f"rows lost to the race: {sorted(lost)}"
    resurrected = {0, 1} & set(ks)
    assert not resurrected, f"deleted rows resurrected: {resurrected}"
    assert ks == want
