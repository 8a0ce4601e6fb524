from .columns import HMMColumns, build_columns
from .genotyping import PairHMM
from .sampling import HaplotypeSampler
from .forward_backward import ColumnArrays, forward_backward
from .viterbi import viterbi
