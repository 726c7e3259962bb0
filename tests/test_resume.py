"""Mid-training checkpoint/resume through the CLI driver."""

import numpy as np

from surel_plus_tpu.utils.config import ExperimentConfig


def test_resume_continues_training(tmp_path):
    from surel_plus_tpu.cli.main import run_experiment

    cfg = ExperimentConfig(
        dataset="synth", metric="Hits@50", synth_nodes=200,
        synth_edges=1000, num_walks=8, num_steps=3, batch_size=128,
        epochs=2, eval_steps=1, runs=1, hidden_channels=16,
        log_dir=str(tmp_path), early_stop=-1)
    run_experiment(cfg)
    ckpt = tmp_path / "synth" / "model" / "latest_0"
    assert ckpt.exists()

    cfg2 = ExperimentConfig(
        dataset="synth", metric="Hits@50", synth_nodes=200,
        synth_edges=1000, num_walks=8, num_steps=3, batch_size=128,
        epochs=4, eval_steps=1, runs=1, hidden_channels=16,
        log_dir=str(tmp_path), early_stop=-1, resume=str(ckpt))
    out = run_experiment(cfg2)
    # resumed run evaluates only epochs 2..3 (start_epoch = saved+1)
    n_evals = len(out["results"]._run_results(0))
    assert n_evals == 2
