"""Old-API (pre-v0.4.0) entry point: only accepts the legacy kwargs."""


def simple_evaluate(model, tasks, num_fewshot=0, limit=None, batch_size=1):
    from . import _evaluate_impl

    return _evaluate_impl(model, tasks, num_fewshot=num_fewshot, limit=limit, batch_size=batch_size)
