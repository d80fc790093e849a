package org.apache.spark.sql.execution

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.codegen.CodeGenerator

/** Test-only probe: force-compile every WholeStageCodegen subtree of a
  * plan and THROW on Janino failure. `spark.sql.codegen.fallback`
  * does not turn whole-stage compile errors into query failures (the
  * executor logs an ERROR and silently interprets the stage), so a
  * spec that wants "this plan really runs generated code" must compile
  * the generated source itself. Lives in the Spark execution package
  * to reach the private[spark] compile API.
  */
object CodegenProbe {

  /** Number of whole-stage subtrees compiled; throws if any fails. */
  def compileWholeStage(df: DataFrame): Int = {
    val subtrees = df.queryExecution.executedPlan.collect {
      case w: WholeStageCodegenExec => w
    }
    subtrees.foreach { w =>
      val (_, source) = w.doCodeGen()
      CodeGenerator.compile(source) // throws CompileException on failure
    }
    subtrees.size
  }
}
