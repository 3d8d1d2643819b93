from million_tpu.pq.ops import (  # noqa: F401
    pq_encode,
    pq_decode,
    build_lut,
    lut_scores,
    subspace_view,
)
from million_tpu.pq.kmeans import train_pq, kmeans  # noqa: F401
