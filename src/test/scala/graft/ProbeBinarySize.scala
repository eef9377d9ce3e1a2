package graft
import graft.core.splice.Convert
import org.apache.spark.sql.SparkSession
import java.io.{ByteArrayOutputStream, ObjectOutputStream}
object ProbeBinarySize {
  def sizeOf(o: AnyRef): Long =
    try {
      val bos = new ByteArrayOutputStream
      val oos = new ObjectOutputStream(bos)
      oos.writeObject(o); oos.close(); bos.size.toLong
    } catch { case e: Throwable => -1L }
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val Ref = "/root/reference/testdata"
    val (sit, aff) = Convert.convertInMemory(spark,
      s"$Ref/GLAD9_SectionSummary.csv", s"$Ref/GLAD9_Site1_SparseSplice.csv")
    val imr = aff.queryExecution.executedPlan.collectLeaves()
      .collectFirst { case s: org.apache.spark.sql.execution.columnar.InMemoryTableScanExec => s.relation }
    imr match {
      case Some(rel) =>
        val cp = rel.cachedPlan
        println(s"TOTAL cachedPlan ${sizeOf(cp)}")
        cp.foreach { node =>
          val sz = sizeOf(node)
          if (sz > 1000000) println(f"NODE $sz%12d  ${node.getClass.getSimpleName}  ${node.simpleStringWithNodeId()}")
        }
      case None => println("no InMemoryTableScanExec found")
    }
    spark.stop()
  }
}
