"""Stub of lm_eval.api.model.LM — the abstract base the adapter subclasses."""


class LM:
    def __init__(self) -> None:
        pass

    def loglikelihood(self, requests):
        raise NotImplementedError

    def loglikelihood_rolling(self, requests):
        raise NotImplementedError

    def generate_until(self, requests):
        raise NotImplementedError
