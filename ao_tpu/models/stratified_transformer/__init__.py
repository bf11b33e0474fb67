from .stratified import StratifiedTransformer
