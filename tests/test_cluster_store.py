"""llmops/dedup.py::merge_cluster_store — the incremental cluster tier.
Invariant under test: ANY fold sequence of a pair set must read back
equal to the one-shot dup_clusters over the union (the spanning-forest
argument), including batches that MERGE previously separate clusters."""

import random

from pyspark.sql import functions as F

from rassengine_spark.llmops.dedup import (dup_clusters, merge_cluster_store,
                                           read_cluster_store)


def _pairs_df(spark, pairs):
    return spark.createDataFrame(pairs, "id_a long, id_b long")


def _store(spark, path, batches):
    for b in batches:
        merge_cluster_store(spark, str(path), _pairs_df(spark, b))
    return {(r.node, r.root, r.cluster_size)
            for r in read_cluster_store(spark, str(path)).collect()}


def _batch(spark, pairs):
    return {(r.node, r.root, r.cluster_size)
            for r in dup_clusters(_pairs_df(spark, pairs)).collect()}


def test_second_batch_merges_two_clusters(spark, tmp_path):
    b1 = [(1, 2), (10, 11)]          # two clusters
    b2 = [(2, 10)]                   # bridges them
    got = _store(spark, tmp_path / "s", [b1, b2])
    assert got == _batch(spark, b1 + b2)
    # everything collapsed to root 1, size 4
    assert got == {(1, 1, 4), (2, 1, 4), (10, 1, 4), (11, 1, 4)}


def test_untouched_components_pass_through(spark, tmp_path):
    b1 = [(1, 2), (10, 11), (20, 21), (20, 22)]
    b2 = [(2, 3)]                    # touches ONLY the {1,2} cluster
    got = _store(spark, tmp_path / "s", [b1, b2])
    assert got == _batch(spark, b1 + b2)
    assert (10, 10, 2) in got and (20, 20, 3) in got


def test_random_fold_sequences_equal_batch(spark, tmp_path):
    rng = random.Random(7)
    nodes = list(range(40))
    pairs = sorted({tuple(sorted(rng.sample(nodes, 2)))
                    for _ in range(60)})
    pairs = [p for p in pairs if p[0] != p[1]]
    want = _batch(spark, pairs)
    for trial in range(2):
        rng.shuffle(pairs)
        cut1, cut2 = len(pairs) // 3, 2 * len(pairs) // 3
        batches = [pairs[:cut1], pairs[cut1:cut2], pairs[cut2:]]
        got = _store(spark, tmp_path / f"t{trial}", batches)
        assert got == want, trial


def test_new_nodes_only_batch(spark, tmp_path):
    got = _store(spark, tmp_path / "s", [[(1, 2)], [(100, 101)]])
    assert got == {(1, 1, 2), (2, 1, 2), (100, 100, 2), (101, 100, 2)}


def test_duplicate_pairs_are_idempotent(spark, tmp_path):
    got = _store(spark, tmp_path / "s", [[(1, 2)], [(1, 2), (2, 1)]])
    assert got == {(1, 1, 2), (2, 1, 2)}


def test_fold_crash_leaves_previous_state_intact(spark, tmp_path):
    """In-place folds write-then-swap: simulate each crash point the swap
    can leave behind and assert the store heals to a committed state."""
    import os
    import shutil

    p = tmp_path / "s"
    _store(spark, p, [[(1, 2)]])
    data = str(p / "data")
    committed = {(1, 1, 2), (2, 1, 2)}

    # crash DURING the sibling write (garbage tmp, data intact)
    os.makedirs(data + ".__fold_tmp/partial", exist_ok=True)
    assert _store(spark, p, [[(10, 11)]]) == committed | {
        (10, 10, 2), (11, 10, 2)}

    # crash BETWEEN the two renames (data gone, bak = committed state)
    shutil.move(data, data + ".__fold_bak")
    got = {(r.node, r.root, r.cluster_size)
           for r in read_cluster_store(spark, str(p)).collect()}
    assert got == committed | {(10, 10, 2), (11, 10, 2)}
    assert not os.path.exists(data + ".__fold_bak")

    # crash AFTER the swap, before cleanup (bak is stale — discarded)
    os.makedirs(data + ".__fold_bak/stale", exist_ok=True)
    assert _store(spark, p, [[(2, 3)]]) == {
        (1, 1, 3), (2, 1, 3), (3, 1, 3), (10, 10, 2), (11, 10, 2)}
    assert not os.path.exists(data + ".__fold_bak")


def test_swap_commit_retries_when_reader_heal_races(tmp_path):
    """A concurrent reader's heal_swapped_dir may restore bak -> data in
    the window between the writer's two renames; the commit rename then
    finds data_p occupied and must retry the swap instead of erroring
    (ADVICE r5: the fold job used to fail with data_p-exists)."""
    import os

    from rassengine_spark.util import heal_swapped_dir, swap_commit_dir

    data = str(tmp_path / "data")

    def write_v(path, tag):
        os.makedirs(path)
        with open(os.path.join(path, "v"), "w") as f:
            f.write(tag)

    write_v(data, "old")

    real_rename = os.rename
    raced = {"done": False}

    def racing_rename(src, dst):
        # just before the writer's tmp -> data rename, a reader heals
        if src.endswith(".__fold_tmp") and not raced["done"]:
            raced["done"] = True
            heal_swapped_dir(data)      # restores bak -> data
        real_rename(src, dst)

    os.rename = racing_rename
    try:
        swap_commit_dir(lambda tmp: write_v(tmp, "new"), data)
    finally:
        os.rename = real_rename
    assert raced["done"]
    with open(os.path.join(data, "v")) as f:
        assert f.read() == "new"
    assert not os.path.exists(data + ".__fold_bak")
    assert not os.path.exists(data + ".__fold_tmp")


def test_concurrent_fold_refused_while_lease_live(tmp_path):
    """Single-writer ENFORCED (VERDICT r06 #4): a second fold starting
    mid-window must fail fast with RuntimeError — before touching tmp,
    bak, or data — and the first fold must still commit cleanly."""
    import os

    import pytest

    from rassengine_spark.util import swap_commit_dir

    data = str(tmp_path / "data")

    def write_v(path, tag):
        os.makedirs(path)
        with open(os.path.join(path, "v"), "w") as f:
            f.write(tag)

    write_v(data, "old")
    refused = {}

    def first_fold_write(tmp):
        # mid-window: the first writer holds the lease; a second fold
        # arriving now must be refused without touching anything
        with pytest.raises(RuntimeError, match="concurrent fold"):
            swap_commit_dir(lambda t: write_v(t, "intruder"), data)
        with open(os.path.join(data, "v")) as f:
            refused["data_during"] = f.read()
        write_v(tmp, "new")

    swap_commit_dir(first_fold_write, data)
    assert refused["data_during"] == "old"   # intruder touched nothing
    with open(os.path.join(data, "v")) as f:
        assert f.read() == "new"             # first fold committed
    assert not os.path.exists(data + ".__fold_lock")


def test_stale_lease_is_broken_and_heal_respects_live_lease(tmp_path):
    """A crashed writer's lease (dead pid) must not block the next fold;
    heal_swapped_dir must no-op while a LIVE lease exists (the bak/tmp
    siblings are the writer's working state) but heal after it goes
    stale."""
    import json
    import os
    import socket
    import subprocess

    from rassengine_spark.util import heal_swapped_dir, swap_commit_dir

    data = str(tmp_path / "data")

    def write_v(path, tag):
        os.makedirs(path)
        with open(os.path.join(path, "v"), "w") as f:
            f.write(tag)

    write_v(data, "old")
    # a pid that has provably exited on this host
    proc = subprocess.Popen(["true"])
    proc.wait()
    lock = data + ".__fold_lock"
    with open(lock, "w") as f:
        json.dump({"pid": proc.pid, "host": socket.gethostname(),
                   "ts": 0}, f)
    # stale lease broken: the fold proceeds
    swap_commit_dir(lambda t: write_v(t, "new"), data)
    with open(os.path.join(data, "v")) as f:
        assert f.read() == "new"
    assert not os.path.exists(lock)

    # live lease (this very process): heal must not touch the siblings
    with open(lock, "w") as f:
        json.dump({"pid": os.getpid(), "host": socket.gethostname(),
                   "ts": 0}, f)
    os.rename(data, data + ".__fold_bak")    # writer mid-window
    heal_swapped_dir(data)
    assert os.path.exists(data + ".__fold_bak")   # untouched
    assert not os.path.exists(data)
    # lease released (writer crashed): heal restores the committed state
    os.unlink(lock)
    heal_swapped_dir(data)
    with open(os.path.join(data, "v")) as f:
        assert f.read() == "new"
    assert not os.path.exists(data + ".__fold_bak")


def test_lease_refused_across_real_processes(tmp_path):
    """Cross-PROCESS enforcement (not just a simulated lock file): while
    this process holds the lease, a genuinely separate Python process
    must get the RuntimeError refusal; after release it must acquire."""
    import subprocess
    import sys

    from rassengine_spark.util import acquire_fold_lease, release_fold_lease

    data = str(tmp_path / "data")
    prog = (
        "import sys; sys.path.insert(0, %r)\n"
        "from rassengine_spark.util import acquire_fold_lease, "
        "release_fold_lease\n"
        "try:\n"
        "    lock = acquire_fold_lease(%r)\n"
        "except RuntimeError:\n"
        "    print('REFUSED'); sys.exit(0)\n"
        "release_fold_lease(lock)\n"
        "print('ACQUIRED')\n"
    ) % (str(__import__('pathlib').Path(__file__).parent.parent), data)
    lock = acquire_fold_lease(data)
    try:
        out = subprocess.run([sys.executable, "-c", prog],
                             capture_output=True, text=True, timeout=60)
        assert out.stdout.strip() == "REFUSED", out.stdout + out.stderr
    finally:
        release_fold_lease(lock)
    out = subprocess.run([sys.executable, "-c", prog],
                         capture_output=True, text=True, timeout=60)
    assert out.stdout.strip() == "ACQUIRED", out.stdout + out.stderr


def test_lease_pid_reuse_expires_by_ttl_not_liveness(tmp_path):
    """Pid reuse is real at scale: a lease whose recorded pid now names
    a LIVE but UNRELATED process (here: pid 1) must still expire by TTL
    — TTL, not pid-liveness, is the cross-crash contract (VERDICT r07
    #7). Fresh, the foreign-pid lease is honored (can't distinguish it
    from the true holder); aged past the TTL it must break even though
    os.kill(pid, 0) says someone is alive at that pid."""
    import json
    import os
    import socket

    import pytest

    from rassengine_spark.util import acquire_fold_lease, release_fold_lease

    data = str(tmp_path / "data")
    lock_p = data + ".__fold_lock"
    # pid 1 is always alive (init) and never this test's fold process —
    # the exact shape a recycled pid produces after a holder crash
    with open(lock_p, "w") as f:
        json.dump({"pid": 1, "host": socket.gethostname(),
                   "ts": 0, "token": "ghost"}, f)
    with pytest.raises(RuntimeError, match="concurrent fold"):
        acquire_fold_lease(data)          # fresh: live-by-assumption
    os.utime(lock_p, (0, 0))              # aged past FOLD_LEASE_TTL_SEC
    lock = acquire_fold_lease(data)       # TTL wins over pid-liveness
    release_fold_lease(lock)
    assert not os.path.exists(lock_p)


def test_stolen_lease_aborts_commit(tmp_path):
    """A fold whose lease is broken (stale) and re-acquired by another
    writer while its materialization runs must ABORT at the commit gate
    (ADVICE r07): renaming its tmp over the new writer's state would be
    the silent interleave the lease exists to prevent. The loser must
    also NOT release the winner's lease on its way out."""
    import json
    import os
    import socket

    import pytest

    from rassengine_spark.util import swap_commit_dir

    data = str(tmp_path / "data")
    lock_p = data + ".__fold_lock"

    def write_v(path, tag):
        os.makedirs(path)
        with open(os.path.join(path, "v"), "w") as f:
            f.write(tag)

    write_v(data, "old")

    def slow_write(tmp):
        # while this writer materializes, its lease is stolen: a second
        # writer broke it as stale (TTL) and wrote its own
        with open(lock_p, "w") as f:
            json.dump({"pid": 1, "host": socket.gethostname(),
                       "ts": 0, "token": "thief"}, f)
        write_v(tmp, "loser")

    with pytest.raises(RuntimeError, match="another writer"):
        swap_commit_dir(slow_write, data)
    with open(os.path.join(data, "v")) as f:
        assert f.read() == "old"          # loser never committed
    with open(lock_p) as f:
        assert json.load(f)["token"] == "thief"   # winner's lease intact
    os.unlink(lock_p)

    # and a vanished lease (broken, not yet re-acquired) also aborts
    def vanish_write(tmp):
        os.unlink(lock_p)
        write_v(tmp, "loser2")

    with pytest.raises(RuntimeError, match="vanished"):
        swap_commit_dir(vanish_write, data)
    with open(os.path.join(data, "v")) as f:
        assert f.read() == "old"


def test_corrupt_lease_expires_by_ttl(tmp_path):
    """A partially-written lease file (crash between O_EXCL create and
    the json write) must still expire by TTL — unreadable content can
    never veto staleness — while a FRESH unreadable lease stays live
    (another writer may be mid-create)."""
    import os

    import pytest

    from rassengine_spark.util import acquire_fold_lease, release_fold_lease

    data = str(tmp_path / "data")
    lock_p = data + ".__fold_lock"
    with open(lock_p, "w") as f:
        f.write("")                       # corrupt: no json
    # fresh + unreadable => live => refused
    with pytest.raises(RuntimeError, match="concurrent fold"):
        acquire_fold_lease(data)
    # aged past the TTL => stale => broken and re-acquired
    os.utime(lock_p, (0, 0))
    lock = acquire_fold_lease(data)
    release_fold_lease(lock)


def test_swap_commit_never_promotes_partial_tmp(tmp_path):
    """A write() that materializes tmp partially and then errors (the
    ENOSPC class) must NOT be committed by the retry loop: the partial
    tmp is discarded and rebuilt, and the committed dir holds the
    complete new state with the backup cleaned up."""
    import os

    from rassengine_spark.util import swap_commit_dir

    data = str(tmp_path / "data")
    os.makedirs(data)
    with open(os.path.join(data, "v"), "w") as f:
        f.write("old")

    calls = {"n": 0}

    def flaky_write(path):
        calls["n"] += 1
        os.makedirs(path)
        with open(os.path.join(path, "v"), "w") as f:
            f.write("partial")
        if calls["n"] == 1:
            raise OSError("no space left on device")
        with open(os.path.join(path, "v"), "w") as f:
            f.write("new-complete")

    swap_commit_dir(flaky_write, data)
    assert calls["n"] == 2          # partial tmp discarded, rebuilt
    with open(os.path.join(data, "v")) as f:
        assert f.read() == "new-complete"
    assert not os.path.exists(data + ".__fold_bak")
    assert not os.path.exists(data + ".__fold_tmp")


def test_cluster_keepers_argmax_and_ties(spark):
    """cluster_keepers: highest score wins regardless of id order; exact
    score ties break to the smallest id; singleton-free clusters only
    (clusters input has no unclustered nodes by construction)."""
    from rassengine_spark.llmops.dedup import cluster_keepers

    pairs = _pairs_df(spark, [(1, 2), (2, 3), (10, 11)])
    clusters = dup_clusters(pairs)
    scores = spark.createDataFrame(
        [(1, 5.0), (2, 9.0), (3, 9.0),     # argmax 9.0 tie -> min id 2
         (10, 1.0), (11, 7.0)],            # higher id wins on score
        "id long, score double")
    got = {(r.root, r.keeper, r.keeper_score, r.cluster_size)
           for r in cluster_keepers(clusters, scores).collect()}
    assert got == {(1, 2, 9.0, 3), (10, 11, 7.0, 2)}
