from openkeonspark_tpu.models.base import (KGEModel, TableSpec, get_model,  # noqa: F401
                                           init_tables, padded_rows,
                                           strip_padding)
from openkeonspark_tpu.models.transe import TransE  # noqa: F401
from openkeonspark_tpu.models.transh import TransH  # noqa: F401
from openkeonspark_tpu.models.transr import TransR  # noqa: F401
from openkeonspark_tpu.models.transd import TransD  # noqa: F401
from openkeonspark_tpu.models.distmult import DistMult  # noqa: F401
from openkeonspark_tpu.models.complexe import ComplEx  # noqa: F401
from openkeonspark_tpu.models.rotate import RotatE  # noqa: F401
