"""Data pipeline: adjacency/velocity loading, chronological splits, z-score
normalization, sliding-window supervision, and device-side batching."""

from stgcn_tpu.data.datasets import (  # noqa: F401
    KNOWN_DATASETS,
    ForecastDataset,
    ZScoreScaler,
    chrono_split,
    gather_windows,
    load_adj,
    load_vel,
    make_windows,
    split_lengths,
    window_starts,
)
from stgcn_tpu.data.synthetic import (  # noqa: F401
    ensure_vel,
    generate_synthetic_vel,
    random_road_graph,
)
