from .columns import HMMColumns, build_columns
from .genotyping import PairHMM
