from dl_speech_enhancement_tpu.parallel.mesh import (
    make_mesh,
    shard_batch,
    replicate,
    shard_train_state,
)
