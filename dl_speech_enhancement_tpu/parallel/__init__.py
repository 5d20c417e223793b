from dl_speech_enhancement_tpu.parallel.mesh import (
    make_mesh,
    shard_batch,
    replicate,
    shard_train_state,
)
from dl_speech_enhancement_tpu.parallel.serve import make_sharded_stream
from dl_speech_enhancement_tpu.parallel.time_shard import (
    time_sharded_forward,
    make_time_sharded_steps,
)
