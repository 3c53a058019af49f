"""Worker for the preemption test: a long run that expects SIGTERM."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 1)
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")


def main(workdir: str) -> None:
    from mfvae_tpu.config import ExperimentConfig
    from mfvae_tpu.training.experiment import Experiment

    cfg = ExperimentConfig()
    cfg.env.num_good_agents = 1
    cfg.env.num_adversaries = 2
    cfg.env.num_obs = 1
    cfg.env.max_steps = 16
    cfg.model.idx_features = 8
    cfg.model.obs_features = 8
    cfg.model.action_features = 8
    cfg.model.encoder_hidden = (16,)
    cfg.model.decoder_hidden = (32,)
    cfg.model.compute_dtype = "float32"
    cfg.buffer.max_size = 64
    cfg.buffer.min_size = 4
    cfg.buffer.batch_size = 8
    cfg.train.batch_size = 8
    cfg.train.sample_num = 8
    cfg.train.train_num = 2
    cfg.train.test_num = 2
    cfg.train.epoch_num = 100_000  # never finishes without preemption
    cfg.train.checkpoint_every = 5  # periodic saves double as the test's
    # progress signal (metrics logging is deferred to end-of-run)
    cfg.train.resume = True
    cfg.train.log_dir = f"{workdir}/results"
    cfg.train.checkpoint_dir = f"{workdir}/ckpt"
    exp = Experiment(cfg).setup()
    print(f"start_epoch={exp.start_epoch}", flush=True)
    result = exp.run()
    print(f"result={result}", flush=True)


if __name__ == "__main__":
    main(sys.argv[1])
