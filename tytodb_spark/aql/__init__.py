"""AQL — the reference's "Alba" command language, re-fronted onto Spark.

Grammar (reference src/main.rs:69-89, keywords src/lexer_functions.rs:21-55):

  CREATE CONTAINER 'name' [col, ...] [TYPE, ...]
  CREATE ROW [col, ...] [val, ...] ON 'container'
  SEARCH [col, ...] ON ['c1', (SUB SEARCH ...), ...] [WHERE cond {AND|OR cond}]
  EDIT ROW [col, ...] [val, ...] ON 'container' WHERE ...
  DELETE ROW ON 'container' [WHERE ...]
  DELETE CONTAINER 'container'
  COMMIT ['container'] | ROLLBACK ['container']
  QYCNNXT 'query-id' | QYCNPVS 'query-id' | QYCNEXT 'query-id'

Literals: 'string', 123, 4.5, true/false, §<base64> bytes
(src/lexer_functions.rs:429-456), ? placeholders bound from an arguments
list (src/main.rs:30-33, src/parser.rs:591-652).
"""

from tytodb_spark.aql.lexer import lex, Token
from tytodb_spark.aql import ast
from tytodb_spark.aql.parser import parse

__all__ = ["lex", "Token", "ast", "parse"]
