"""Train a HAN/GAT model on a named dataset (the ex_acm3025.py equivalent).

    python scripts/train.py --dataset acm
    python scripts/train.py --dataset dblp --set train.epochs=150
    python scripts/train.py --dataset imdb --set model.impl=dense
    python scripts/train.py --dataset ppi          # inductive GAT

Prints per-epoch metrics (train/val loss+acc and mean semantic attention,
matching the reference's epoch log, ex_acm3025.py:220-223) and final test
accuracy + KNN/KMeans embedding scores (jhyexp.py semantics).
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))

import jax


def main():
    import os

    # HAN_TPU_PLATFORM=cpu forces the virtual-device CPU mesh (the axon TPU
    # plugin re-registers itself even under JAX_PLATFORMS=cpu; the config
    # update is the authoritative switch — see conftest.py)
    if os.environ.get("HAN_TPU_PLATFORM"):
        jax.config.update("jax_platforms", os.environ["HAN_TPU_PLATFORM"])
    jax.config.update("jax_compilation_cache_dir",
                      str(pathlib.Path(__file__).parent.parent / ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    from han_tpu.train.config import parse_cli

    cfg = parse_cli()

    if cfg.data.dataset == "ppi":
        from han_tpu.datasets.ppi import ppi_synthetic
        from han_tpu.train.inductive import InductiveTrainer

        trainer = InductiveTrainer(ppi_synthetic(), lr=cfg.train.lr,
                                   l2_coef=cfg.train.l2_coef)
        result = trainer.fit(epochs=min(cfg.train.epochs, 40))
        print({k: v for k, v in result.items() if k != "history"})
        return

    from han_tpu.datasets.registry import load_dataset
    from han_tpu.train.trainer import Trainer

    ds = load_dataset(cfg.data.dataset)
    result = Trainer(ds, cfg).fit()
    print(result)


if __name__ == "__main__":
    main()
