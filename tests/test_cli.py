"""CLI-level tests: config overrides, end-to-end experiment runs on
synthetic data for link, hetero (MAG), and higher-order drivers."""

import numpy as np
import pytest

from surel_plus_tpu.utils.config import (
    ExperimentConfig, apply_dataset_overrides)


def test_dataset_overrides():
    cfg = apply_dataset_overrides(ExperimentConfig(dataset="ogbl-collab"))
    assert cfg.metric == "Hits@50" and cfg.use_val and cfg.alpha == 0.7
    cfg = apply_dataset_overrides(ExperimentConfig(dataset="ogbl-citation2"))
    assert cfg.metric == "MRR" and cfg.alpha == 0.1
    cfg = apply_dataset_overrides(ExperimentConfig(dataset="ogbl-vessel"))
    assert cfg.use_raw and cfg.metric == "AUC"
    cfg = apply_dataset_overrides(ExperimentConfig(dataset="ogbl-ppa"))
    assert cfg.metric == "Hits@100" and cfg.alpha == 0.5
    cfg = apply_dataset_overrides(ExperimentConfig(dataset="ogbl-ddi"))
    assert cfg.metric == "Hits@20"
    cfg = apply_dataset_overrides(ExperimentConfig(dataset="mag"))
    assert cfg.metric == "MRR"
    with pytest.raises(NotImplementedError):
        apply_dataset_overrides(ExperimentConfig(dataset="unknown"))


def test_config_argparse_roundtrip():
    import argparse

    from surel_plus_tpu.utils.config import (add_config_args,
                                             config_from_args)
    parser = argparse.ArgumentParser()
    add_config_args(parser)
    args = parser.parse_args(["--dataset", "synth", "--num_walks", "42",
                              "--lr", "0.01", "--use_val"])
    cfg = config_from_args(args)
    assert cfg.dataset == "synth" and cfg.num_walks == 42
    assert cfg.lr == 0.01 and cfg.use_val


def test_run_experiment_link(tmp_path):
    from surel_plus_tpu.cli.main import run_experiment

    cfg = ExperimentConfig(
        dataset="synth", metric="Hits@50", synth_nodes=300,
        synth_edges=1500, num_walks=8, num_steps=3, batch_size=128,
        epochs=2, eval_steps=1, runs=1, hidden_channels=16,
        log_dir=str(tmp_path), early_stop=-1)
    out = run_experiment(cfg)
    (valid, test) = out["best"][0]
    assert 0.0 <= valid <= 1.0 and 0.0 <= test <= 1.0


def test_device_engine_batches_epochs_per_eval_block(tmp_path,
                                                     monkeypatch):
    """The flagship CLI must dispatch ONE device program per inter-eval
    block (VERDICT r4 item 5): eval_steps=2 over 5 epochs = blocks of
    1+2+2 epochs = 3 fit dispatches, with evals after epochs 0, 2, 4 —
    the exact cadence of the former per-epoch loop."""
    from surel_plus_tpu.cli.main import run_experiment
    from surel_plus_tpu.train.device import DeviceTrainer

    calls = []
    orig_fit = DeviceTrainer.fit

    def spy_fit(self, params, opt_state, edges_dev, labels_dev, key,
                n_epochs):
        calls.append(n_epochs)
        return orig_fit(self, params, opt_state, edges_dev, labels_dev,
                        key, n_epochs)

    monkeypatch.setattr(DeviceTrainer, "fit", spy_fit)
    cfg = ExperimentConfig(
        dataset="synth", metric="Hits@50", synth_nodes=300,
        synth_edges=1500, num_walks=8, num_steps=3, batch_size=128,
        epochs=5, eval_steps=2, runs=1, hidden_channels=16,
        log_dir=str(tmp_path), early_stop=-1, engine="device")
    out = run_experiment(cfg)
    assert calls == [1, 2, 2], calls
    (valid, test) = out["best"][0]
    assert 0.0 <= valid <= 1.0 and 0.0 <= test <= 1.0


def test_run_experiment_ppr_path(tmp_path):
    from surel_plus_tpu.cli.main import run_experiment

    cfg = ExperimentConfig(
        dataset="synth", metric="AUC", sencoder="PPR", synth_nodes=200,
        synth_edges=1000, topk=16, batch_size=128, epochs=1, eval_steps=1,
        runs=1, hidden_channels=16, log_dir=str(tmp_path))
    out = run_experiment(cfg)
    assert "best" in out


def test_run_experiment_hetero(tmp_path):
    from surel_plus_tpu.cli.main import run_experiment

    cfg = ExperimentConfig(
        dataset="synth-mag", metric="MRR", relation="cite",
        synth_nodes=200, synth_edges=800, num_walks=8, num_steps=3,
        batch_size=128, epochs=1, eval_steps=1, runs=1,
        hidden_channels=16, log_dir=str(tmp_path))
    out = run_experiment(cfg)
    assert "best" in out


def test_run_experiment_horder(tmp_path):
    from surel_plus_tpu.cli.main_horder import run_experiment

    cfg = ExperimentConfig(
        dataset="synth-hyper", synth_nodes=150, synth_edges=500,
        num_walks=8, num_steps=3, batch_size=128, epochs=1, eval_steps=1,
        runs=1, hidden_channels=16, log_dir=str(tmp_path), k=5)
    out = run_experiment(cfg)
    assert "best" in out


def test_horder_checkpoint_and_inf_only(tmp_path):
    """Reference main_horder.py:107,134-137 parity: early stop saves a
    checkpoint; --inf_only --load_model reloads it for eval-only."""
    import glob

    from surel_plus_tpu.cli.main_horder import run_experiment

    cfg = ExperimentConfig(
        dataset="synth-hyper", synth_nodes=150, synth_edges=500,
        num_walks=8, num_steps=3, batch_size=128, epochs=3, eval_steps=1,
        early_stop=1, runs=1, hidden_channels=16, log_dir=str(tmp_path),
        k=5)
    run_experiment(cfg)
    ckpts = glob.glob(f"{tmp_path}/synth-hyper/model/*_0")
    assert ckpts, "early stop must save a best checkpoint"

    cfg2 = ExperimentConfig(
        dataset="synth-hyper", synth_nodes=150, synth_edges=500,
        num_walks=8, num_steps=3, batch_size=128, runs=1,
        hidden_channels=16, log_dir=str(tmp_path), k=5,
        inf_only=True, load_model=ckpts[0])
    out = run_experiment(cfg2)
    res = out["results"]
    assert len(res) == 3 and 0.0 <= res[1] <= 1.0


def test_npz_ingest_path(tmp_path):
    """--dataset npz:<path> loads a RawLinkData export through the same
    pipeline as fixture/OGB data (README 'Real-OGB ingest'): the day a
    real ogbl-collab export appears, accuracy parity needs zero code."""
    import numpy as np

    from surel_plus_tpu.cli.main import run_experiment
    from surel_plus_tpu.graph.datasets import (npz_link_data,
                                               synthetic_link_data)

    raw = synthetic_link_data(num_nodes=300, num_edges=1200, seed=3)
    p = tmp_path / "ogbl-collab.npz"  # name carries dataset overrides
    np.savez(
        p, num_nodes=raw.num_nodes,
        train_edge=raw.split_edge["train"]["edge"],
        train_weight=np.ones(len(raw.split_edge["train"]["edge"]),
                             np.float32),
        valid_edge=raw.split_edge["valid"]["edge"],
        valid_weight=np.ones(len(raw.split_edge["valid"]["edge"]),
                             np.float32),
        valid_neg=raw.split_edge["valid"]["edge_neg"],
        test_edge=raw.split_edge["test"]["edge"],
        test_weight=np.ones(len(raw.split_edge["test"]["edge"]),
                            np.float32),
        test_neg=raw.split_edge["test"]["edge_neg"])

    loaded = npz_link_data(str(p))
    assert loaded.num_nodes == raw.num_nodes
    np.testing.assert_array_equal(loaded.split_edge["test"]["edge"],
                                  raw.split_edge["test"]["edge"])

    cfg = ExperimentConfig(
        dataset=f"npz:{p}", num_walks=8, num_steps=3, batch_size=128,
        epochs=1, eval_steps=1, runs=1, hidden_channels=16,
        log_dir=str(tmp_path), k=5, use_weight=True)
    from surel_plus_tpu.utils.config import apply_dataset_overrides
    cfg = apply_dataset_overrides(cfg)
    assert cfg.metric == "Hits@50" and cfg.use_val  # collab rules fired
    out = run_experiment(cfg)
    assert "best" in out


def test_npz_ingest_mrr_layout(tmp_path):
    """Directed (citation2-style) npz layout with per-source negatives."""
    import numpy as np

    from surel_plus_tpu.graph.datasets import npz_link_data

    rng = np.random.default_rng(0)
    n, e, k = 100, 400, 7
    np.savez(tmp_path / "cit.npz", num_nodes=n,
             train_src=rng.integers(0, n, e),
             train_dst=rng.integers(0, n, e),
             valid_src=rng.integers(0, n, 30),
             valid_dst=rng.integers(0, n, 30),
             valid_neg=rng.integers(0, n, (30, k)),
             test_src=rng.integers(0, n, 30),
             test_dst=rng.integers(0, n, 30),
             test_neg=rng.integers(0, n, (30, k)))
    raw = npz_link_data(str(tmp_path / "cit.npz"))
    assert raw.directed
    assert raw.split_edge["valid"]["target_node_neg"].shape == (30, k)
    assert raw.edge_index.shape == (2, e)


def test_npz_ingest_mag(tmp_path):
    """--dataset npz:<mag file> routes through DEHDataset.from_npz and
    the full relation pipeline (README 'MAG / hypergraph ingest'): the
    day a real mag_{cite,write}.pl export appears, Table-3 MAG rows need
    zero code."""
    import numpy as np

    from surel_plus_tpu.cli.main import run_experiment
    from surel_plus_tpu.graph.datasets import (DEHDataset,
                                               synthetic_hetero_data)

    ds = synthetic_hetero_data(num_authors=60, num_papers=100,
                               num_writes=300, num_cites=400,
                               relation="cite", seed=5, k=3)
    se = ds.split_edge
    p = tmp_path / "mag_cite.npz"  # 'mag' in the name routes the branch
    np.savez(
        p, num_nodes=ds.num_nodes, obsrv_edge=ds.obsrv_edge,
        node_types=np.array(ds.node_type, dtype="U16"),
        train_src=se["train"]["source_node"],
        train_dst=se["train"]["target_node"],
        valid_src=se["valid"]["source_node"],
        valid_dst=se["valid"]["target_node"],
        valid_neg=se["valid"]["target_node_neg"],
        test_src=se["test"]["source_node"],
        test_dst=se["test"]["target_node"],
        test_neg=se["test"]["target_node_neg"])

    loaded = DEHDataset.from_npz(str(p), k=3)
    assert loaded.num_nodes == ds.num_nodes
    assert loaded.node_type == ds.node_type
    np.testing.assert_array_equal(loaded.train_edge, ds.train_edge)
    np.testing.assert_array_equal(
        loaded.split_edge["test"]["target_node_neg"],
        se["test"]["target_node_neg"])

    cfg = ExperimentConfig(
        dataset=f"npz:{p}", relation="cite", metric="MRR", num_walks=8,
        num_steps=3, batch_size=128, epochs=1, eval_steps=1, runs=1,
        hidden_channels=16, log_dir=str(tmp_path), k=3)
    out = run_experiment(cfg)
    assert "best" in out


def test_npz_ingest_hyper(tmp_path):
    """--dataset npz:<path> in main_horder routes through
    DEHyperDataset.from_npz (tags-math / DBLP-coauthor ingest)."""
    import numpy as np

    from surel_plus_tpu.cli.main_horder import run_experiment
    from surel_plus_tpu.graph.datasets import (DEHyperDataset,
                                               synthetic_hyper_data)

    ds = synthetic_hyper_data(num_nodes=150, num_triplets=600, seed=7)
    t = ds.split_edge
    p = tmp_path / "tags-math.npz"
    np.savez(
        p, num_nodes=ds.num_nodes, edge_index=ds.obsrv_edge,
        train_hedge=t["train"]["hedge"],
        valid_hedge=t["valid"]["hedge"], valid_neg=t["valid"]["hedge_neg"],
        test_hedge=t["test"]["hedge"], test_neg=t["test"]["hedge_neg"])

    loaded = DEHyperDataset.from_npz(str(p), k=5)
    assert loaded.num_nodes == ds.num_nodes
    np.testing.assert_array_equal(loaded.split_edge["train"]["hedge"],
                                  t["train"]["hedge"])

    cfg = ExperimentConfig(
        dataset=f"npz:{p}", num_walks=8, num_steps=3, batch_size=128,
        epochs=1, eval_steps=1, runs=1, hidden_channels=16,
        log_dir=str(tmp_path), k=5)
    out = run_experiment(cfg)
    assert "best" in out
