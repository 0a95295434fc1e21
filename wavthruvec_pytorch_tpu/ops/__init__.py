from wavthruvec_pytorch_tpu.ops.masking import (  # noqa: F401
    get_mask_from_lengths,
    get_non_pad_mask,
    get_attn_key_pad_mask,
    positions_from_lengths,
)
from wavthruvec_pytorch_tpu.ops.positional import sinusoid_encoding_table  # noqa: F401
from wavthruvec_pytorch_tpu.ops.mas import mas_width1, mas_width1_batched, mas_width1_numpy  # noqa: F401
from wavthruvec_pytorch_tpu.ops.length_regulator import (  # noqa: F401
    durations_to_alignment,
    expand_by_durations,
)
