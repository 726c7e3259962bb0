"""Experiment driver for link / relation prediction.

Equivalent of the reference CLI (main.py:25-258): dataset load + masking,
offline sampling (LP walks or PPR/SPD/DEG metric path), model construction,
run/epoch loops with eval cadence, early-stop checkpointing, and aggregate
statistics. Differences: typed config instead of argparse-only, OGB loading
gated with a synthetic fallback, and all device work on TPU via JAX.

Usage:
  python -m surel_plus_tpu.cli.main --dataset synth-collab --epochs 20 ...
"""

from __future__ import annotations

import argparse
import dataclasses
import logging
import os
import time
from typing import Dict

import jax

# SUREL_PLATFORM=cpu forces the CPU backend for offline runs; the axon
# TPU plugin overrides platform selection programmatically, so the
# JAX_PLATFORMS environment variable alone cannot (CLAUDE.md).
if os.environ.get("SUREL_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["SUREL_PLATFORM"])
import numpy as np

from surel_plus_tpu.graph.datasets import (
    LinkPropDataset, RawLinkData, from_ogb, synthetic_link_data)
from surel_plus_tpu.graph.splits import get_pos_neg_edges
from surel_plus_tpu.models import Net
from surel_plus_tpu.ops.encoders import encoding, scalar_spg_from_csr
from surel_plus_tpu.ops.ppr import topk_ppr_matrix
from surel_plus_tpu.ops.sampler import subg_matrix
from surel_plus_tpu.train import LinkPredictor, TrainConfig, evaluate
from surel_plus_tpu.utils.checkpoint import load_checkpoint, save_checkpoint
from surel_plus_tpu.utils.config import (
    ExperimentConfig, add_config_args, apply_dataset_overrides,
    config_from_args)
from surel_plus_tpu.utils.logger import ResultLogger, set_up_log
from surel_plus_tpu.utils.profiling import metrics
from surel_plus_tpu.utils.seeding import set_random_seed

log = logging.getLogger(__name__)


def load_raw(cfg: ExperimentConfig) -> RawLinkData:
    if cfg.dataset.startswith("ogbl-"):
        return from_ogb(cfg.dataset)
    if cfg.dataset.startswith("fixture-"):
        from surel_plus_tpu.graph.datasets import fixture_link_data

        return fixture_link_data(cfg.dataset.split("-", 1)[1])
    if cfg.dataset.startswith("npz:"):
        # drop-in real-OGB ingest: a RawLinkData npz export (README
        # "Real-OGB ingest"); name the file after the dataset (e.g.
        # ogbl-collab.npz) so the per-dataset overrides match
        from surel_plus_tpu.graph.datasets import npz_link_data

        return npz_link_data(cfg.dataset[4:])
    if "synth" in cfg.dataset:
        return synthetic_link_data(
            num_nodes=cfg.synth_nodes, num_edges=cfg.synth_edges,
            seed=cfg.seed, num_feature=16 if cfg.use_raw else 0,
            mrr_style=("MRR" in cfg.metric))
    raise NotImplementedError(cfg.dataset)


def load_hetero(cfg: ExperimentConfig, rng):
    """MAG relation datasets (reference main.py:131-133): real pickles or a
    synthetic stand-in."""
    from surel_plus_tpu.graph.datasets import (
        DEHDataset, synthetic_hetero_data)

    if "synth" in cfg.dataset:
        return synthetic_hetero_data(relation=cfg.relation, seed=cfg.seed,
                                     mask_ratio=cfg.train_ratio, k=cfg.k,
                                     rng=rng)
    if cfg.dataset.startswith("npz:"):
        # torch-free real-MAG ingest (README "MAG / hypergraph ingest");
        # keep 'mag' in the file name so this branch routes here
        return DEHDataset.from_npz(cfg.dataset[4:],
                                   mask_ratio=cfg.train_ratio, k=cfg.k,
                                   rng=rng)
    return DEHDataset.from_pickle(
        f"./dataset/sgrl/{cfg.dataset}_{cfg.relation}.pl", cfg.relation,
        mask_ratio=cfg.train_ratio, k=cfg.k, rng=rng)


def _scalar_pipeline(cfg, G, logger, save_load: bool = False):
    """PPR/SPD/DEG metric path incl. the save/load npz cache
    (main.py:181-202)."""
    from scipy.sparse import load_npz, save_npz

    ppr_path = (f"{cfg.dataset}_z_{cfg.alpha}_{cfg.topk}_{cfg.eps}.npz"
                if save_load else None)
    if save_load and cfg.load_ppr:
        try:
            x = load_npz(ppr_path)
        except FileNotFoundError:
            logger.info("%s does not exist.", ppr_path)
            raise
    else:
        idx = np.arange(G.num_nodes)
        x = topk_ppr_matrix(G, cfg.alpha, cfg.eps, idx, cfg.topk,
                            normalization="sym", nthreads=cfg.nthread)
        if save_load and cfg.save_ppr:
            save_npz(ppr_path, x.tocsr())
    x, _ = encoding(x.tocsr(), G.to_scipy(), cfg.sencoder)
    return scalar_spg_from_csr(x.tocsr())


def run_experiment(cfg: ExperimentConfig, logger=None) -> Dict:
    """Returns {'best': [(valid, test) per run], 'results': ResultLogger}."""
    rng = set_random_seed(cfg.seed)
    if logger is None:
        logger = set_up_log(cfg.log_dir, cfg.dataset,
                            args_repr=str(dataclasses.asdict(cfg)))
    if cfg.debug:
        from surel_plus_tpu.utils.logger import capture_stdout
        capture_stdout(logger)

    if "mag" in cfg.dataset:
        ds = load_hetero(cfg, rng)
        raw_split, raw_edge_index = ds.split_edge, ds.train_edge.T
    else:
        raw = load_raw(cfg)
        ds = LinkPropDataset(
            raw, mask_ratio=cfg.train_ratio, k=cfg.k,
            use_weight=cfg.use_weight, use_coalesce=cfg.use_weight,
            use_feature=cfg.use_raw, use_val=cfg.use_val, rng=rng,
            vessel_mode=("vessel" in cfg.dataset))
        raw_split, raw_edge_index = raw.split_edge, raw.edge_index
    graphs = ds.process(logger)

    train_edge = (ds.pos_edge.T.astype(np.int32),
                  ds.neg_edge.T.astype(np.int32))
    val_edge = get_pos_neg_edges("valid", raw_split, raw_edge_index,
                                 ds.num_nodes, percent=cfg.valid_perc,
                                 rng=rng)
    test_edge = get_pos_neg_edges("test", raw_split, raw_edge_index,
                                  ds.num_nodes, rng=rng)
    inf_edge = {"valid": val_edge, "test": test_edge}

    G_obsrv, G_inf = graphs["train"], graphs["test"]

    use_device_engine = (
        cfg.engine == "device"
        or (cfg.engine == "auto"
            and jax.default_backend() not in ("cpu",)))

    prep_start = time.time()
    feature = getattr(ds, "x", None) if cfg.use_raw else None
    if cfg.use_raw and cfg.use_pretrain and feature is not None:
        # concat pretrained node embeddings (main.py:157-160)
        import torch

        pre = torch.load("pretrain_embedding.pt",
                         map_location="cpu").numpy()
        feature = np.concatenate([feature, pre], axis=-1)
    x_dim = feature.shape[1] if feature is not None else ds.num_feature
    tcfg = TrainConfig(batch_size=cfg.batch_size, lr=cfg.lr,
                       epochs=cfg.epochs, eval_steps=cfg.eval_steps,
                       early_stop=cfg.early_stop, seed=cfg.seed)

    if use_device_engine and cfg.sencoder != "LP":
        # metric path (PPR/SPD/DEG) on the device engine: host scipy prep
        # once, then padded ScalarSpG tiles drive the same one-program
        # epoch/score scans as the LP keys engine
        from surel_plus_tpu.train.scalar import scalar_trainer_from_spg

        x_spg = _scalar_pipeline(cfg, G_obsrv, logger)
        z_spg = _scalar_pipeline(cfg, G_inf, logger, save_load=True)
        input_dim = 1
        model = Net(input_dim=input_dim, hidden_dim=cfg.hidden_channels,
                    out_dim=1, x_dim=x_dim, dropout=cfg.dropout,
                    use_feature=cfg.use_raw, aggrs=cfg.aggrs,
                    dtype="bfloat16")
        feat_dev = (None if feature is None
                    else jax.numpy.asarray(feature))
        trainer = scalar_trainer_from_spg(model, x_spg, tcfg,
                                          feature=feat_dev)
        scorer = scalar_trainer_from_spg(model, z_spg, tcfg,
                                         feature=feat_dev)
    elif use_device_engine:
        # TPU path: packed-key SpG + device-resident engine (bf16 compute)
        from surel_plus_tpu.ops.sampler import subg_matrix_device_keys
        from surel_plus_tpu.train.device import trainer_from_keys

        bucket = cfg.bucket if cfg.bucket and cfg.bucket > 0 else None
        x_keys = subg_matrix_device_keys(
            G_obsrv, np.arange(G_obsrv.num_nodes, dtype=np.int32),
            num_walks=cfg.num_walks, num_steps=cfg.num_steps,
            seed=cfg.seed, bucket=bucket)
        z_keys = subg_matrix_device_keys(
            G_inf, np.arange(G_inf.num_nodes, dtype=np.int32),
            num_walks=cfg.num_walks, num_steps=cfg.num_steps,
            seed=cfg.seed, bucket=bucket)
        input_dim = cfg.num_steps
        fused = {"auto": None, "on": True, "off": False}[cfg.fused_hidden]
        model = Net(input_dim=input_dim, hidden_dim=cfg.hidden_channels,
                    out_dim=1, x_dim=x_dim, dropout=cfg.dropout,
                    use_feature=cfg.use_raw, aggrs=cfg.aggrs,
                    dtype="bfloat16", fused_hidden=fused)
        feat_dev = (None if feature is None
                    else jax.numpy.asarray(feature))
        trainer = trainer_from_keys(model, x_keys, tcfg, feature=feat_dev)
        scorer = trainer_from_keys(model, z_keys, tcfg, feature=feat_dev)
    elif cfg.sencoder == "LP":
        bucket = cfg.bucket if cfg.bucket and cfg.bucket > 0 else None
        x_spg = subg_matrix(G_obsrv, np.arange(G_obsrv.num_nodes,
                                               dtype=np.int32),
                            num_walks=cfg.num_walks, bucket=bucket,
                            num_steps=cfg.num_steps, seed=cfg.seed)
        z_spg = subg_matrix(G_inf, np.arange(G_inf.num_nodes,
                                             dtype=np.int32),
                            num_walks=cfg.num_walks, bucket=bucket,
                            num_steps=cfg.num_steps, seed=cfg.seed)
        input_dim = cfg.num_steps
        model = Net(input_dim=input_dim, hidden_dim=cfg.hidden_channels,
                    out_dim=1, x_dim=x_dim, dropout=cfg.dropout,
                    use_feature=cfg.use_raw, aggrs=cfg.aggrs)
        trainer = LinkPredictor(model, x_spg, tcfg, feature=feature)
        scorer = LinkPredictor(model, z_spg, tcfg, feature=feature)
    else:
        x_spg = _scalar_pipeline(cfg, G_obsrv, logger)
        z_spg = _scalar_pipeline(cfg, G_inf, logger, save_load=True)
        input_dim = 1
        model = Net(input_dim=input_dim, hidden_dim=cfg.hidden_channels,
                    out_dim=1, x_dim=x_dim, dropout=cfg.dropout,
                    use_feature=cfg.use_raw, aggrs=cfg.aggrs)
        from surel_plus_tpu.train.scalar import ScalarLinkPredictor
        trainer = ScalarLinkPredictor(model, x_spg, tcfg, feature=feature)
        scorer = ScalarLinkPredictor(model, z_spg, tcfg, feature=feature)
    logger.info("Prep. Runtime (%s): %.2fs", cfg.sencoder,
                time.time() - prep_start)
    metrics.add("prep", time.time() - prep_start)

    edges = np.concatenate(train_edge, axis=1)
    labels = np.concatenate([
        np.ones(train_edge[0].shape[1], np.float32),
        np.zeros(train_edge[1].shape[1], np.float32)])

    if use_device_engine:
        import jax.numpy as jnp

        from surel_plus_tpu.train.device import evaluate_device

        edges_dev = jnp.asarray(edges)
        labels_dev = jnp.asarray(labels)

        if cfg.balance_widths:
            bucket_w = int(trainer.sarr[0].shape[1])
            classes = tuple(sorted(
                int(w) for w in cfg.balance_widths.split(",")))
            if classes[-1] < bucket_w:
                classes = classes + (bucket_w,)
            logger.info("balanced-width batching: classes %s", classes)

            def run_epochs(params, opt_state, key, n):
                p, o, losses, aucs, _ = trainer.fit_balanced(
                    params, opt_state, edges, labels, key, n, classes)
                return p, o, np.asarray(losses), np.asarray(aucs)
        else:
            def run_epochs(params, opt_state, key, n):
                # n epochs = ONE device program (DeviceTrainer.fit): each
                # dispatch costs ~1 s on the tunneled link, so per-epoch
                # dispatch between evals is pure overhead (VERDICT r4
                # item 5; same pattern as main_horder.py)
                p, o, losses, aucs = trainer.fit(
                    params, opt_state, edges_dev, labels_dev, key, n)
                return p, o, np.asarray(losses), np.asarray(aucs)

        def run_eval(params):
            return evaluate_device(scorer, params, inf_edge, cfg.metric)
    else:
        def run_epochs(params, opt_state, key, n):
            losses, aucs = [], []
            for sub in jax.random.split(key, n):
                params, opt_state, loss, auc = trainer.train_epoch(
                    params, opt_state, edges, labels, rng, sub)
                losses.append(loss)
                aucs.append(auc)
            return params, opt_state, np.asarray(losses), np.asarray(aucs)

        def run_eval(params):
            return evaluate(scorer, params, inf_edge, cfg.metric)

    rlog = ResultLogger(runs=cfg.runs, metric=cfg.metric,
                        early_stop=cfg.early_stop)
    stamp = time.strftime("%m%d%y_%H%M%S")

    if cfg.inf_only and cfg.load_model:
        params = load_checkpoint(cfg.load_model)["params"]
        results, d_inf = run_eval(params)
        logger.info("inference-only results: %s (T_test %.2fs)",
                    results, d_inf)
        return {"results": results}

    for run in range(cfg.runs):
        params, opt_state = trainer.init(
            jax.random.PRNGKey(cfg.seed + run),
            edges[:, :cfg.batch_size])
        key = jax.random.PRNGKey(cfg.seed + 1000 + run)
        start_epoch = 0
        if cfg.resume and run == 0:
            # mid-training resume (beyond the reference, which can only
            # reload for inference — main.py:221-228): restores params,
            # optimizer state, epoch, and the epoch PRNG key
            state = load_checkpoint(cfg.resume, target={
                "params": params, "opt_state": opt_state,
                "epoch": np.asarray(0), "key": np.asarray(key)})
            params, opt_state = state["params"], state["opt_state"]
            start_epoch = int(state["epoch"]) + 1
            key = jax.numpy.asarray(state["key"])
            logger.info("resumed from %s at epoch %d", cfg.resume,
                        start_epoch)
        epoch = start_epoch
        while epoch < cfg.epochs:
            # train up to and including the next eval epoch (e where
            # e % eval_steps == 0) as ONE block — identical epoch/eval
            # cadence to the former per-epoch loop, eval_steps fewer
            # dispatches per block on the device engine
            n = (1 - epoch) % cfg.eval_steps
            if n == 0:
                n = cfg.eval_steps
            n = min(n, cfg.epochs - epoch)
            key, sub = jax.random.split(key)
            with metrics.phase("train_epoch", items=edges.shape[1] * n):
                params, opt_state, losses, aucs = run_epochs(
                    params, opt_state, sub, n)
            for i in range(n):
                logger.info("Run: %02d, Epoch: %02d, Loss: %.4f, "
                            "AUC: %.4f", run + 1, epoch + i,
                            float(losses[i]), float(aucs[i]))
            epoch += n
            last = epoch - 1
            if last % cfg.eval_steps == 0:
                save_checkpoint(
                    {"params": params, "opt_state": opt_state,
                     "epoch": np.asarray(last),
                     "key": np.asarray(key)},
                    f"{cfg.log_dir}/{cfg.dataset}/model/latest_{run}")
                with metrics.phase("eval"):
                    results, d_inf = run_eval(params)
                logger.info("eval: %s (T_test %.2f)", results, d_inf)
                if rlog.add_result(run, results):
                    save_checkpoint(
                        {"params": params, "epoch": np.asarray(last)},
                        f"{cfg.log_dir}/{cfg.dataset}/model/"
                        f"{stamp}_{run}")
                    break
        rlog.print_statistics(run=run, logger=logger)
    if cfg.runs > 1:
        rlog.print_statistics(logger=logger)
    for name, st in metrics.report().items():
        logger.info("phase %s: %.2fs x%d (%,.0f items/s)".replace(
            "%,", "%"), name, st.total_s, st.count, st.items_per_s)
    return {"results": rlog,
            "best": [rlog.best(r) for r in range(cfg.runs)]}


def main(argv=None):
    parser = argparse.ArgumentParser(
        description="SUREL+ TPU: link/relation prediction")
    add_config_args(parser)
    args = parser.parse_args(argv)
    cfg = apply_dataset_overrides(config_from_args(args))
    out = run_experiment(cfg)
    print(out.get("best"))


if __name__ == "__main__":
    main()
