"""ClearML hyperparameter-optimization analog (reference
utils/loggers/clearml/hpo.py): a HyperParameterOptimizer over a template
training task, searching the same 29-key hyp space as --evolve.

The clearml (and optuna) packages are absent in this image; the function
exercises the real SDK call surface and is covered by mocked-SDK tests
(tests/test_loggers_sdk.py). The search space is derived from the evolve
bounds table (train/evolve.py META) so the two HPO paths — local genetic
--evolve and remote ClearML sweeps — stay consistent.
"""

from __future__ import annotations

from yolov3_tpu.utils.general import LOGGER


def build_search_space():
    """UniformParameterRange list over the evolve bounds (reference
    clearml/hpo.py:28-59 — the same 29 hyp keys, 'Hyperparameters/<key>')."""
    from clearml.automation import UniformParameterRange

    from yolov3_tpu.train.evolve import META

    return [
        UniformParameterRange(f"Hyperparameters/{k}", min_value=float(lo), max_value=float(hi))
        for k, (_, lo, hi) in META.items()
    ]


def run_clearml_hpo(
    base_task_id,
    project_name="Hyper-Parameter Optimization",
    task_name="yolov3_tpu",
    objective_metric=("metrics", "mAP_0.5"),
    max_concurrent=1,
    total_max_jobs=20,
    save_top_k=5,
    time_limit_minutes=120.0,
    run_locally=True,
):
    """Optimize a template training task's hyperparameters through ClearML
    (reference clearml/hpo.py:11-90): Optuna search when installed, random
    search otherwise, over the evolve-bounds space; returns the optimizer
    after completion so callers can read top experiments."""
    from clearml import Task
    from clearml.automation import HyperParameterOptimizer, RandomSearch

    try:
        from clearml.automation.optuna import OptimizerOptuna as optimizer_class
    except ImportError:
        optimizer_class = RandomSearch
        LOGGER.warning("clearml-optuna not installed — falling back to RandomSearch")

    Task.init(
        project_name=project_name,
        task_name=task_name,
        task_type=Task.TaskTypes.optimizer,
        reuse_last_task_id=False,
    )
    optimizer = HyperParameterOptimizer(
        base_task_id=base_task_id,
        hyper_parameters=build_search_space(),
        objective_metric_title=objective_metric[0],
        objective_metric_series=objective_metric[1],
        objective_metric_sign="max",
        max_number_of_concurrent_tasks=max_concurrent,
        optimizer_class=optimizer_class,
        save_top_k_tasks_only=save_top_k,
        compute_time_limit=None,
        total_max_jobs=total_max_jobs,
        min_iteration_per_job=None,
        max_iteration_per_job=None,
    )
    optimizer.set_report_period(10 / 60)
    optimizer.set_time_limit(in_minutes=time_limit_minutes)
    if run_locally:
        optimizer.start_locally()
    else:
        optimizer.start()
    optimizer.wait()
    optimizer.stop()
    return optimizer
