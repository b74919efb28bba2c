from fourdgs.eval.ate import align_horn, evaluate_ate  # noqa: F401
from fourdgs.eval.rendering import eval_rendering  # noqa: F401
