from wavthruvec_pytorch_tpu.models.text2vec import Text2Vec  # noqa: F401
from wavthruvec_pytorch_tpu.models.vec2wav import (  # noqa: F401
    Generator,
    MultiPeriodDiscriminator,
    MultiScaleDiscriminator,
)
from wavthruvec_pytorch_tpu.models.ecapa import ECAPA_TDNN  # noqa: F401
from wavthruvec_pytorch_tpu.models.extras import PostNet, Prenet  # noqa: F401
