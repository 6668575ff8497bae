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

    from han_tpu.train import trainer
    from han_tpu.train.config import parse_cli

    cfg = parse_cli()
    # every dataset — including inductive PPI — goes through the same front
    # door; trainer.run() routes on the dataset type
    result = trainer.run(cfg)
    print(result)


if __name__ == "__main__":
    main()
