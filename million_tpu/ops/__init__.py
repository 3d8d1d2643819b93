from million_tpu.ops.pq_attention_ref import (  # noqa: F401
    pq_decode_attention_ref,
    dense_decode_attention,
    merge_partials,
    causal_attention,
)
