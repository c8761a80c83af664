"""Seeded randomized fuzz of the versioned-table branch machinery against
an independent pure-Python ancestry model: random interleavings of
commit / create-branch / vacuum(fold) / fast-forward-merge must keep
tableformat's ancestry answers, branch heads, and head reads EXACTLY in
lockstep with a model that never forgets history — the class of bug this
hunts is precisely the r10 FF-over-diverged-branch walk error and any
regression the r11 tombstone FOLD could have introduced (a mis-re-pointed
parent silently changes which merges fast-forward)."""

from __future__ import annotations

import random

import pytest

from data_ingestion_spark.operators import tableformat as tf


def test_fold_branch_merge_fuzz(spark, tmp_path):
    root = str(tmp_path / "t")
    rnd = random.Random(1108)

    # ---- the model: full, never-vacuumed history ----
    parents: dict[int, int] = {}     # v -> parent v (-1 = root)
    heads: dict[str, int] = {}       # branch -> head v
    n_branches = 0

    def model_is_anc(anc: int, v: int) -> bool:
        cur = v
        while cur >= 0:
            if cur == anc:
                return True
            cur = parents.get(cur, -1)
        return False

    def commit(branch: str) -> None:
        df = spark.createDataFrame([(heads.get(branch, -1),)], "prev long")
        if branch == "main":
            v = tf.commit_version(df, root)
        else:
            v = tf.commit_to_branch(df, root, branch)
        parents[v] = heads.get(branch, -1)
        heads[branch] = v

    commit("main")  # seed history so create_branch has a head to point at
    ops = 0
    for _ in range(60):
        ops += 1
        choice = rnd.random()
        if choice < 0.45:
            commit(rnd.choice(sorted(heads)))
        elif choice < 0.6 and n_branches < 4:
            n_branches += 1
            name = f"b{n_branches}"
            tf.create_branch(root, name)
            heads[name] = heads["main"]
        elif choice < 0.8:
            removed = tf.vacuum(root, keep_last=rnd.randrange(1, 3))
            # vacuum must never remove a branch head
            assert not set(removed) & set(heads.values())
        elif len(heads) >= 2:
            src, tgt = rnd.sample(sorted(heads), 2)
            model_ff = (
                heads[src] == heads[tgt]
                or model_is_anc(heads[tgt], heads[src])
            )
            if model_ff:
                got = tf.merge_branch(root, src, tgt)
                assert got == heads[src]
                heads[tgt] = heads[src]
            else:
                with pytest.raises(ValueError, match="non-fast-forward"):
                    tf.merge_branch(root, src, tgt)

        # ---- lockstep invariants after EVERY operation ----
        m = tf.read_manifest(root)
        live = {e["v"] for e in m["versions"]}
        assert not any(e.get("pruned") for e in m["versions"])  # fold, not stubs
        tf_heads = dict(m.get("branches", {}))
        tf_heads["main"] = m["current"]
        assert tf_heads == heads, (ops, tf_heads, heads)
        assert set(heads.values()) <= live  # heads always readable
        # every pair of heads answers ancestry exactly like the model
        hs = sorted(set(heads.values()))
        for a in hs:
            for v in hs:
                assert tf._is_ancestor(m, a, v) == model_is_anc(a, v), (
                    ops, a, v, m["versions"], parents,
                )
        # head reads resolve and carry the payload committed at that head
        for b, h in heads.items():
            assert tf.read_branch(spark, root, b).first()["prev"] == parents[h]

    # the fold keeps the manifest bounded by what is actually reachable:
    # every live entry is a head or an ancestor some head still pins
    m = tf.read_manifest(root)
    assert len(m["versions"]) <= 2 * (len(heads) + 2)
