from contextgs_tpu.scene.cameras import Camera  # noqa: F401
from contextgs_tpu.scene.dataset_readers import load_scene, SceneInfo  # noqa: F401
