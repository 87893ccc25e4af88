"""Early stopping + learning-rate-on-plateau for the embedder train loops —
the counterpart of the reference's default Keras callbacks
(`embiggen/embedders/tensorflow_embedders/tensorflow_embedder.py:264-277`:
EarlyStopping(monitor="loss", min_delta, patience) and
ReduceLROnPlateau(monitor="loss", min_delta, patience, factor=0.5)).

The controller is host-side state updated once per epoch from the scanned
epoch-mean loss; its state round-trips through checkpoints so a killed and
resumed fit makes bit-identical decisions.
"""
from __future__ import annotations

import numpy as np


class PlateauController:
    """Keras-semantics loss plateau tracking.

    `update(loss)` returns True when training should stop. An epoch
    "improves" when loss < best - min_delta; `patience` epochs without
    improvement trigger the action (stop, resp. lr *= factor)."""

    def __init__(
        self,
        early_stopping_min_delta: float = 0.001,
        early_stopping_patience: int = 1,
        learning_rate_plateau_min_delta: float = 0.001,
        learning_rate_plateau_patience: int = 1,
        learning_rate_plateau_factor: float = 0.5,
    ):
        self._es_delta = float(early_stopping_min_delta)
        self._es_patience = int(early_stopping_patience)
        self._lr_delta = float(learning_rate_plateau_min_delta)
        self._lr_patience = int(learning_rate_plateau_patience)
        self._lr_factor = float(learning_rate_plateau_factor)
        self._es_best = np.inf
        self._es_wait = 0
        self._lr_best = np.inf
        self._lr_wait = 0
        self.lr_scale = 1.0
        self.stopped_epoch = None

    def update(self, loss: float) -> bool:
        loss = float(loss)
        if not np.isfinite(loss):
            # NaN/Inf loss: stop immediately (TerminateOnNaN analogue).
            return True
        if loss < self._lr_best - self._lr_delta:
            self._lr_best = loss
            self._lr_wait = 0
        else:
            self._lr_wait += 1
            if self._lr_wait >= self._lr_patience:
                self.lr_scale *= self._lr_factor
                self._lr_wait = 0
        if loss < self._es_best - self._es_delta:
            self._es_best = loss
            self._es_wait = 0
            return False
        self._es_wait += 1
        return self._es_wait >= self._es_patience

    # ------------------------------------------------- checkpoint round-trip
    def state_array(self) -> np.ndarray:
        return np.asarray(
            [
                self._es_best, float(self._es_wait),
                self._lr_best, float(self._lr_wait),
                self.lr_scale,
            ],
            dtype=np.float64,
        )

    def load_state_array(self, state: np.ndarray) -> None:
        state = np.asarray(state, dtype=np.float64)
        self._es_best = float(state[0])
        self._es_wait = int(state[1])
        self._lr_best = float(state[2])
        self._lr_wait = int(state[3])
        self.lr_scale = float(state[4])
