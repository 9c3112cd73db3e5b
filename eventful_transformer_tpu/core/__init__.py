from eventful_transformer_tpu.core.counting import COUNT_KEYS, Counts, Ctx, zero_counts
from eventful_transformer_tpu.core.gating import (
    MatmulBuffer,
    MatmulDeltaAccumulator,
    SimpleSTGTGate,
    TokenBuffer,
    TokenDeltaGate,
    TokenGate,
)
from eventful_transformer_tpu.core.policies import (
    TokenNormThreshold,
    TokenNormTopFraction,
    TokenNormTopK,
)
