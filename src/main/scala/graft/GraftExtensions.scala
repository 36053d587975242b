package graft

import graft.functions.native.{CosineSimilarity, DotProduct}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** The engine's SparkSessionExtensions entry point — the PUBLIC extension
  * mechanism (no internal APIs): install with
  *   .config("spark.sql.extensions", "graft.GraftExtensions")
  * or `SparkSession.builder.withExtensions(new GraftExtensions)`.
  *
  * Injects the native codegen'd vector kernels as SQL-callable functions:
  *   graft_dot(a, b)     — fused dot product over array<float|double>
  *   graft_cosine(a, b)  — fused cosine similarity
  *
  * Similarity.dot/cosine pick these up automatically (via
  * `call_function`) when the active session has them registered, and fall
  * back to the equivalent zip_with/aggregate HOF plan when not — sessions
  * without the extension lose only speed, never answers.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    def inject(name: String, builder: Seq[Expression] => Expression,
               className: String): Unit =
      ext.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo(className, name),
        (children: Seq[Expression]) => {
          require(children.length == 2, s"$name expects 2 arguments")
          builder(children)
        }))
    inject("graft_dot", c => DotProduct(c(0), c(1)),
      classOf[DotProduct].getName)
    inject("graft_cosine", c => CosineSimilarity(c(0), c(1)),
      classOf[CosineSimilarity].getName)
  }
}
