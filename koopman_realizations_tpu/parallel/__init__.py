from koopman_realizations_tpu.parallel.mesh import (  # noqa: F401
    data_sharding,
    make_mesh,
    pad_to_multiple,
    replicated,
)
from koopman_realizations_tpu.parallel.edmd_sharded import koopman_gram_sharded  # noqa: F401
from koopman_realizations_tpu.parallel.scenarios import (  # noqa: F401
    run_batch_sharded,
    sharded_batch_runner,
)
from koopman_realizations_tpu.parallel.pca_sharded import pca_feature_sharded  # noqa: F401
