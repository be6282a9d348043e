from openkeonspark_tpu.eval.link_prediction import link_prediction  # noqa: F401
from openkeonspark_tpu.eval.classification import (fit_thresholds,  # noqa: F401
                                                   triple_classification)
from openkeonspark_tpu.eval.predict import (predict_head_entity,  # noqa: F401
                                            predict_tail_entity,
                                            predict_relation, predict_triple)
from openkeonspark_tpu.eval.type_constrained import (  # noqa: F401
    type_constrained_link_prediction)
