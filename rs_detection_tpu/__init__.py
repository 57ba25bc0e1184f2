"""rs_detection_tpu: TPU-native oriented object detection framework.

A brand-new JAX/XLA/Pallas implementation of the capabilities of
zcablii/RS_detection (JDet): oriented (rotated-box) detection for
remote-sensing imagery, designed TPU-first.
"""

__version__ = "0.1.0"
