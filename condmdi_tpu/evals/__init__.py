from condmdi_tpu.evals.metrics import (
    euclidean_distance_matrix,
    calculate_top_k,
    calculate_R_precision,
    calculate_matching_score,
    calculate_activation_statistics,
    calculate_diversity,
    calculate_multimodality,
    calculate_frechet_distance,
    calculate_keyframe_error,
    calculate_trajectory_error,
    calculate_trajectory_diversity,
    calculate_skating_ratio,
    get_metric_statistics,
)
from condmdi_tpu.evals.evaluator import EvaluatorWrapper
from condmdi_tpu.evals.harness import EvalConfig, evaluation, generate_eval_batch, compute_kps_error
from condmdi_tpu.evals.a2m import A2MClassifier, STGCNClassifier, evaluate_a2m
from condmdi_tpu.evals.unconstrained import evaluate_unconstrained, calculate_kid, precision_and_recall
