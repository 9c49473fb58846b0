"""Token-index and head-dimension conventions shared by every component.

These mirror the reference's baked-in conventions so checkpoints, label files
and metrics remain comparable (reference: captioning/models/AttModel.py:68-71,
captioning/models/TransformerModel.py:39-42, scripts/prepro_labels.py:337):

  * the vocabulary is offset by +4: ids 0..3 are reserved control tokens,
    real words start at 4 (``tgt_vocab = vocab_size + 4``),
  * syntax-label ids live in the same id space as control tokens:
    VP=4, NP=5, CP=6; a predicted syn id outside [SYN_LOWER, SYN_UPPER]
    terminates bounding,
  * the length head classifies into LENGTH_DIM=20 classes where class 0
    means "stop" and class k means "next phrase has k words",
  * the syntax head classifies into SYN_DIM=10 classes.
"""

PAD = 0
BOS = 1
EOS = 2
LEN = 3          # the [LEN] marker token (also used as the phrase separator id)
VOCAB_OFFSET = 4  # word ids are shifted by this amount

# Syntactic phrase labels (share the control-token id space).
SYN_VP = 4
SYN_NP = 5
SYN_CP = 6
SYN_LOWER = 4
SYN_UPPER = 6

# Classifier head dims (reference: TransformerModel.py:39-40, 184-185, 329-330).
LENGTH_DIM = 20
SYN_DIM = 10
