from openkeonspark_tpu.data.dataset import Dataset, load_dataset, save_dataset  # noqa: F401
from openkeonspark_tpu.data.index import KGIndex, GroupIndex, build_group_index  # noqa: F401
