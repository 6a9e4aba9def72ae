from .metrics import (  # noqa: F401
    EvalAIAnswerProcessor,
    TextVQAAccuracyEvaluator,
    STVQAAccuracyEvaluator,
    STVQAANLSEvaluator,
    decode_predictions,
)
