"""QuantDescriptor: bitwidth / range / scheme / axis metadata for one quantizer.

TPU-native counterpart of sparsebit/quantization/quantizers/quant_descriptor.py:5-111.
ch_axis follows the reference's LAYOUT convention (NCHW -> 1, NLC -> 2,
weights -> 0); bs_axis is 0 for features, None for weights.
"""

from sparsebit_tpu.quantization.common import (
    Granularity,
    QScheme,
    QuantTarget,
    get_qscheme,
    make_qscheme,
)


class QuantDescriptor:
    def __init__(self, cfg):
        self._cfg = cfg
        self._target = cfg.TARGET[0] if isinstance(cfg.TARGET, (list, tuple)) else cfg.TARGET
        self._scheme = get_qscheme(cfg.QSCHEME)
        self._bit = cfg.QUANTIZER.BIT
        self._qmin, self._qmax, self._type = self.calc_qmin_qmax(self._bit, self._scheme)
        self._ch_axis = self._set_channel_axis()
        self._bs_axis = self._set_batchsize_axis()
        self.is_perchannel = self._scheme.is_perchannel
        self.is_symmetric = self._scheme.is_symmetric
        # groupsize==-1 means disabled; used only by the LLM (GPTQ) path
        self.groupsize = int(getattr(cfg.QUANTIZER, "GROUPSIZE", -1))

    @staticmethod
    def calc_qmin_qmax(bit, scheme):
        if scheme.is_symmetric:
            qmin, qmax = -(2 ** (bit - 1)), 2 ** (bit - 1) - 1
            _type = "int{}".format(bit)
        else:
            qmin, qmax = 0, 2**bit - 1
            _type = "uint{}".format(bit)
        return qmin, qmax, _type

    def _set_channel_axis(self):
        if self._target == QuantTarget.FEATURE:
            layout = self._cfg.OBSERVER.LAYOUT
            if layout == "NCHW":
                return 1
            if layout == "NLC":
                return 2
            if layout == "NHWC":  # TPU-native CNN layout
                return 3
            raise NotImplementedError("unsupported layout {}".format(layout))
        return 0  # weight: out-channel first

    def _set_batchsize_axis(self):
        if self._target == QuantTarget.FEATURE:
            layout = self._cfg.OBSERVER.LAYOUT
            if layout in ("NCHW", "NLC", "NHWC"):
                return 0
            raise NotImplementedError
        return None

    def set_bit(self, bit):
        self._bit = bit
        self._qmin, self._qmax, self._type = self.calc_qmin_qmax(bit, self._scheme)

    def set_symmetric(self, is_symmetric: bool):
        self.is_symmetric = bool(is_symmetric)
        self._scheme = make_qscheme(self.is_perchannel, self.is_symmetric)
        self._qmin, self._qmax, self._type = self.calc_qmin_qmax(self._bit, self._scheme)

    @property
    def granularity(self):
        return (
            Granularity.CHANNELWISE if self.is_perchannel else Granularity.LAYERWISE
        )

    @property
    def target(self):
        return self._target

    @property
    def scheme(self):
        return self._scheme

    @property
    def bit(self):
        return self._bit

    @property
    def qmin(self):
        return self._qmin

    @property
    def qmax(self):
        return self._qmax

    @property
    def qrange(self):
        return (self._qmin, self._qmax)

    @property
    def ch_axis(self):
        return self._ch_axis

    @property
    def bs_axis(self):
        return self._bs_axis

    def __repr__(self):
        return "{}\t qmin: {}  qmax: {}, qscheme: {}".format(
            self._type, self.qmin, self.qmax, self.scheme
        )
