"""Higher-order pattern prediction driver (reference main_horder.py:24-141):
3-node hyperedge (triplet) queries over a single encoder graph, HONet model,
MRR evaluation against k random-node negatives.

Usage:
  python -m surel_plus_tpu.cli.main_horder --dataset synth-hyper ...
"""

from __future__ import annotations

import argparse
import dataclasses
import logging
import os
import time

import jax

if os.environ.get("SUREL_PLATFORM"):  # see cli/main.py
    jax.config.update("jax_platforms", os.environ["SUREL_PLATFORM"])
import numpy as np

from surel_plus_tpu.graph.datasets import (
    DEHyperDataset, synthetic_hyper_data)
from surel_plus_tpu.graph.splits import get_pos_neg_edges
from surel_plus_tpu.models import HONet
from surel_plus_tpu.ops.join import hgather_join
from surel_plus_tpu.ops.sampler import subg_matrix
from surel_plus_tpu.train import LinkPredictor, TrainConfig, evaluate
from surel_plus_tpu.utils.checkpoint import (load_checkpoint,
                                             save_checkpoint)
from surel_plus_tpu.utils.config import (
    ExperimentConfig, add_config_args, config_from_args)
from surel_plus_tpu.utils.logger import ResultLogger, set_up_log
from surel_plus_tpu.utils.seeding import set_random_seed

log = logging.getLogger(__name__)


def load_hyper(cfg: ExperimentConfig) -> DEHyperDataset:
    if "synth" in cfg.dataset:
        return synthetic_hyper_data(num_nodes=cfg.synth_nodes,
                                    num_triplets=cfg.synth_edges,
                                    seed=cfg.seed)
    if cfg.dataset.startswith("npz:"):
        # torch-free tags-math / DBLP ingest (README "MAG / hypergraph
        # ingest")
        return DEHyperDataset.from_npz(cfg.dataset[4:], k=cfg.k)
    # tags-math / DBLP-coauthor pickles (dataloader.py:243): torch-format
    import torch

    data = torch.load(f"./dataset/sgrl/{cfg.dataset}.pl")
    return DEHyperDataset(np.asarray(data["edge_index"]),
                          {k: {kk: np.asarray(vv) for kk, vv in v.items()}
                           for k, v in data["triplets"].items()},
                          k=cfg.k)


def run_experiment(cfg: ExperimentConfig, logger=None):
    rng = set_random_seed(cfg.seed)
    if logger is None:
        logger = set_up_log(cfg.log_dir, cfg.dataset,
                            args_repr=str(dataclasses.asdict(cfg)))
    cfg.metric = "MRR"  # always MRR (main_horder.py:69)

    ds = load_hyper(cfg)
    G_enc = ds.process(logger)

    use_device_engine = (
        cfg.engine == "device"
        or (cfg.engine == "auto"
            and jax.default_backend() not in ("cpu",)))

    t0 = time.time()
    # --fused_hidden on|off|auto (auto = fused on TPU), as in cli/main
    fused = {"auto": None, "on": True, "off": False}[cfg.fused_hidden]
    model = HONet(input_dim=cfg.num_steps, hidden_dim=cfg.hidden_channels,
                  dropout=cfg.dropout, fused_hidden=fused)
    tcfg = TrainConfig(batch_size=cfg.batch_size, lr=cfg.lr,
                       epochs=cfg.epochs, eval_steps=cfg.eval_steps,
                       early_stop=cfg.early_stop, seed=cfg.seed)
    if use_device_engine:
        from surel_plus_tpu.ops.join import make_keys_hjoin
        from surel_plus_tpu.ops.sampler import subg_matrix_device_keys
        from surel_plus_tpu.train.device import trainer_from_keys

        spgk = subg_matrix_device_keys(
            G_enc, np.arange(G_enc.num_nodes, dtype=np.int32),
            num_walks=cfg.num_walks, num_steps=cfg.num_steps,
            seed=cfg.seed)
        pred = trainer_from_keys(model, spgk, tcfg,
                                 join_factory=make_keys_hjoin)
    else:
        spg = subg_matrix(G_enc, np.arange(G_enc.num_nodes,
                                           dtype=np.int32),
                          num_walks=cfg.num_walks,
                          num_steps=cfg.num_steps, seed=cfg.seed)
        pred = LinkPredictor(model, spg, tcfg, join_fn=hgather_join)
    logger.info("Prep. Runtime (LP): %.2fs", time.time() - t0)

    pos, neg = ds.pos_hedge.T.astype(np.int32), ds.neg_hedge.T.astype(
        np.int32)
    edges = np.concatenate([pos, neg], axis=1)
    labels = np.concatenate([np.ones(pos.shape[1], np.float32),
                             np.zeros(neg.shape[1], np.float32)])

    val_edge = get_pos_neg_edges("valid", ds.split_edge, None,
                                 ds.num_nodes, percent=cfg.valid_perc)
    test_edge = get_pos_neg_edges("test", ds.split_edge, None,
                                  ds.num_nodes)
    inf_edge = {"valid": val_edge, "test": test_edge}

    if use_device_engine:
        import jax.numpy as jnp

        from surel_plus_tpu.train.device import evaluate_device

        edges_dev = jnp.asarray(edges)
        labels_dev = jnp.asarray(labels)

        def run_epochs(params, opt_state, key, n):
            # n epochs = ONE device program (DeviceTrainer.fit): on the
            # tunneled link each dispatch costs ~1 s, so the per-epoch
            # train_epoch loop the reference-shaped r2 CLI used was pure
            # overhead between evals (VERDICT r2, weak item 7)
            p, o, losses, aucs = pred.fit(params, opt_state, edges_dev,
                                          labels_dev, key, n)
            return p, o, np.asarray(losses), np.asarray(aucs)

        def run_eval(params):
            return evaluate_device(pred, params, inf_edge, "MRR")
    else:
        def run_epochs(params, opt_state, key, n):
            losses, aucs = [], []
            for sub in jax.random.split(key, n):
                params, opt_state, loss, auc = pred.train_epoch(
                    params, opt_state, edges, labels, rng, sub)
                losses.append(loss)
                aucs.append(auc)
            return params, opt_state, np.asarray(losses), np.asarray(aucs)

        def run_eval(params):
            return evaluate(pred, params, inf_edge, "MRR")

    if cfg.inf_only and cfg.load_model:
        # reference main_horder.py:134-137: reload + inference only
        params = load_checkpoint(cfg.load_model)["params"]
        results, d_inf = run_eval(params)
        logger.info("inference-only results: %s (T_test %.2fs)",
                    results, d_inf)
        return {"results": results}

    rlog = ResultLogger(runs=cfg.runs, metric="MRR",
                        early_stop=cfg.early_stop)
    stamp = time.strftime("%m%d%y_%H%M%S")
    for run in range(cfg.runs):
        params, opt_state = pred.init(jax.random.PRNGKey(cfg.seed + run),
                                      edges[:, :cfg.batch_size])
        key = jax.random.PRNGKey(cfg.seed + 1000 + run)
        # eval cadence = eval_steps, so each inter-eval block of epochs
        # runs as one program; epoch 0 evals first like the reference
        epoch = 0
        while epoch < cfg.epochs:
            n = 1 if epoch == 0 else min(cfg.eval_steps,
                                         cfg.epochs - epoch)
            key, sub = jax.random.split(key)
            params, opt_state, losses, aucs = run_epochs(params,
                                                         opt_state, sub, n)
            for i in range(n):
                logger.info("Run: %02d, Epoch: %02d, Loss: %.4f, "
                            "AUC: %.4f", run + 1, epoch + i,
                            float(losses[i]), float(aucs[i]))
            epoch += n
            results, d_inf = run_eval(params)
            logger.info("eval MRR: %s (T_test %.2f)", results, d_inf)
            if rlog.add_result(run, results):
                # best-on-valid checkpoint (main_horder.py:107)
                save_checkpoint(
                    {"params": params, "epoch": np.asarray(epoch - 1)},
                    f"{cfg.log_dir}/{cfg.dataset}/model/{stamp}_{run}")
                break
        rlog.print_statistics(run=run, logger=logger)
    return {"results": rlog,
            "best": [rlog.best(r) for r in range(cfg.runs)]}


def main(argv=None):
    parser = argparse.ArgumentParser(
        description="SUREL+ TPU: higher-order pattern prediction")
    add_config_args(parser)
    args = parser.parse_args(argv)
    cfg = config_from_args(args)
    out = run_experiment(cfg)
    print(out.get("best"))


if __name__ == "__main__":
    main()
